package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.functions._

import graft.operators.{ZCatalog, ZIndex}
import graft.plans.ZoneAggServe

/** q178 — metadata-only MIN/MAX/COUNT off the zone map. Pins:
  * (1) the served plan contains NO file scan (the aggregate folded to
  *     a LocalRelation at optimization time) and the answer equals the
  *     raw-table computation — longs, strings, COUNT(*) and the
  *     null-aware COUNT(col) over the null-bearing partkey;
  * (2) a timestamp MIN serves too (layout files are TIMESTAMP_MICROS,
  *     so the footers carry real bounds);
  * (3) exactness guards: a WHERE between aggregate and scan, or a
  *     DISTINCT, leaves the ordinary plan — scan present, answer
  *     unchanged. */
class ZoneAggServeSpec extends SparkSpec {

  // zConfLock: the z-layout suites all steer spark.graft.zindex.dir on
  // the ONE shared session while suites run in parallel — hold the
  // JVM-wide lock across the whole conf window (see TempDirs.zConfLock)
  private def withConfs[T](pairs: (String, String)*)(f: => T): T =
    TempDirs.zConfLock.synchronized {
      pairs.foreach { case (k, v) => spark.conf.set(k, v) }
      try f finally pairs.foreach { case (k, _) => spark.conf.unset(k) }
    }

  private def li(ids: Range) = {
    import spark.implicits._
    ids.map { i =>
      (if (i % 97 == 0) None else Some(((i.toLong * 7919) % 2000)),
        (i.toLong * 104729) % 15000,
        (i % 100).toLong,
        (i % 50 + 1).toDouble,
        Seq("A", "N", "R")(i % 3),
        java.sql.Timestamp.valueOf(f"2024-01-${i % 28 + 1}%02d 00:00:00"))
    }.toDF("l_partkey", "l_orderkey", "l_suppkey", "l_quantity",
      "l_returnflag", "l_shipdate")
  }

  private def scans(p: SparkPlan): Seq[FileSourceScanExec] = fileScans(p)

  private def servedRows(df: DataFrame): Seq[org.apache.spark.sql.Row] = {
    val rows = df.collect().toSeq
    assert(scans(df.queryExecution.executedPlan).isEmpty,
      "a metadata-served aggregate must contain NO file scan")
    rows
  }

  test("q178: MIN/MAX/COUNT over the catalog table fold to the zone " +
      "map — no scan, exact answers including null-aware COUNT(col)") {
    val dir = TempDirs.create("graft_zagg_corp")
    li(0 until 12000).write.mode("overwrite")
      .parquet(s"$dir/lineitem.parquet")
    withConfs("spark.graft.zindex.dir" -> TempDirs.create("graft_zagg_root")) {
      ZIndex.clearMemo()
      val n0 = ZoneAggServe.servedCount.get()
      val df = ZCatalog.q178ZonemapAgg(spark, dir)
      val served = servedRows(df)
      assert(ZoneAggServe.servedCount.get() > n0,
        "the rewrite must have fired")
      val raw = spark.read.parquet(s"$dir/lineitem.parquet")
      val truth = raw.agg(
        min(col("l_partkey")).as("min_pk"), max(col("l_partkey")).as("max_pk"),
        min(col("l_orderkey")).as("min_ok"), max(col("l_orderkey")).as("max_ok"),
        min(col("l_returnflag")).as("min_flag"),
        max(col("l_returnflag")).as("max_flag"),
        count(lit(1)).as("n_rows"), count(col("l_partkey")).as("n_pk"))
        .collect().toSeq
      assert(served === truth)
      // the fixture's null residue must make COUNT(col) < COUNT(*)
      assert(served.head.getAs[Long]("n_pk") <
        served.head.getAs[Long]("n_rows"))
    }
  }

  test("a timestamp MIN/MAX serves from the micros-written layout " +
      "footers") {
    val dir = TempDirs.create("graft_zagg_corp2")
    li(0 until 6000).write.mode("overwrite")
      .parquet(s"$dir/lineitem.parquet")
    withConfs("spark.graft.zindex.dir" -> TempDirs.create("graft_zagg_root2")) {
      ZIndex.clearMemo()
      val tbl = ZCatalog.ensureRegistered(spark, dir)
      val df = spark.sql(s"SELECT MIN(l_shipdate) AS lo, " +
        s"MAX(l_shipdate) AS hi FROM $tbl")
      val served = servedRows(df)
      val truth = spark.read.parquet(s"$dir/lineitem.parquet")
        .agg(min(col("l_shipdate")).as("lo"), max(col("l_shipdate")).as("hi"))
        .collect().toSeq
      assert(served === truth)
    }
  }

  test("the metadata answer never goes stale: an appended feed is a " +
      "stamp miss, the next served aggregate reads the new generation") {
    val dir = TempDirs.create("graft_zagg_corp4")
    li(0 until 5000).write.mode("overwrite")
      .parquet(s"$dir/lineitem.parquet")
    withConfs("spark.graft.zindex.dir" -> TempDirs.create("graft_zagg_root4")) {
      ZIndex.clearMemo()
      val tbl = ZCatalog.ensureRegistered(spark, dir)
      def count(): Long = {
        val df = spark.sql(s"SELECT COUNT(*) AS n FROM $tbl")
        val n = df.collect()(0).getLong(0)
        assert(scans(df.queryExecution.executedPlan).isEmpty,
          "both counts must be metadata-served")
        n
      }
      assert(count() === 5000L)
      li(5000 until 6500).write.mode("append")
        .parquet(s"$dir/lineitem.parquet")
      assert(count() === 6500L,
        "the served count must track the appended generation — the " +
          "per-query ensure() is the freshness contract")
    }
  }

  test("outer expressions fold on the driver: arithmetic AROUND the " +
      "aggregates serves; a non-deterministic outer bails to the scan") {
    val dir = TempDirs.create("graft_zagg_corp5")
    li(0 until 5000).write.mode("overwrite")
      .parquet(s"$dir/lineitem.parquet")
    withConfs("spark.graft.zindex.dir" -> TempDirs.create("graft_zagg_root5")) {
      ZIndex.clearMemo()
      val tbl = ZCatalog.ensureRegistered(spark, dir)
      // span + ratio: Cast/Subtract/Divide around MIN/MAX/COUNT — the
      // r15 generalized evaluator substitutes the aggregate literals
      // and evaluates the rest on the driver
      val df = spark.sql(
        s"""SELECT MAX(l_orderkey) - MIN(l_orderkey) AS span,
           |  CAST(COUNT(l_partkey) AS DOUBLE) / COUNT(*) AS nn_ratio
           |FROM $tbl""".stripMargin)
      val served = servedRows(df)
      val raw = spark.read.parquet(s"$dir/lineitem.parquet")
      val truth = raw.agg(
        (max(col("l_orderkey")) - min(col("l_orderkey"))).as("span"),
        (count(col("l_partkey")).cast("double") / count(lit(1)))
          .as("nn_ratio")).collect().toSeq
      assert(served === truth)
      // a non-deterministic expression around the aggregate must bail
      val nd = spark.sql(
        s"SELECT MAX(l_orderkey) + rand() AS r FROM $tbl")
      assert(scans(nd.queryExecution.executedPlan).nonEmpty,
        "a non-deterministic outer expression must NOT be metadata-served")
      assert(nd.collect().length === 1)
    }
  }

  test("exactness guards: WHERE or DISTINCT keeps the ordinary plan " +
      "and the unchanged answer") {
    val dir = TempDirs.create("graft_zagg_corp3")
    li(0 until 6000).write.mode("overwrite")
      .parquet(s"$dir/lineitem.parquet")
    withConfs("spark.graft.zindex.dir" -> TempDirs.create("graft_zagg_root3")) {
      ZIndex.clearMemo()
      val tbl = ZCatalog.ensureRegistered(spark, dir)
      val raw = spark.read.parquet(s"$dir/lineitem.parquet")

      val filtered = spark.sql(
        s"SELECT MAX(l_orderkey) AS hi FROM $tbl WHERE l_suppkey = 7")
      val fRows = filtered.collect().toSeq
      assert(scans(filtered.queryExecution.executedPlan).nonEmpty,
        "a filtered aggregate must NOT be metadata-served")
      assert(fRows === raw.filter(col("l_suppkey") === 7L)
        .agg(max(col("l_orderkey")).as("hi")).collect().toSeq)

      val distinct = spark.sql(
        s"SELECT COUNT(DISTINCT l_returnflag) AS n FROM $tbl")
      val dRows = distinct.collect().toSeq
      assert(scans(distinct.queryExecution.executedPlan).nonEmpty,
        "a DISTINCT aggregate must NOT be metadata-served")
      assert(dRows === raw.agg(
        countDistinct(col("l_returnflag")).as("n")).collect().toSeq)
    }
  }
}
