package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.functions._

import graft.operators.{ZCatalog, ZIndex}
import graft.plans.{AllNullZone, DecimalZone, ZoneMapFileIndex}

/** q180/q181 — DECIMAL columns join the zone map (r14 verdict #2).
  * Pins:
  * (1) q180's price-band predicate (DECIMAL-typed end to end) prunes
  *     through the planner: kept set == the driver-side DecimalZone
  *     consult, files_opened ≪ files_total, result == the raw-table
  *     computation;
  * (2) q181's MIN/MAX over decimal measures are METADATA-SERVED — no
  *     scan — with the surrounding CAST( AS DOUBLE) evaluated on the
  *     driver, and COUNT(col) exact over a null-bearing decimal;
  * (3) the decimal zones carry exact footer null counts (the fixture
  *     plants NULL prices). */
class ZDecimalSpec extends SparkSpec {

  // zConfLock: the z-layout suites all steer spark.graft.zindex.dir on
  // the ONE shared session while suites run in parallel — hold the
  // JVM-wide lock across the whole conf window (see TempDirs.zConfLock)
  private def withConfs[T](pairs: (String, String)*)(f: => T): T =
    TempDirs.zConfLock.synchronized {
      pairs.foreach { case (k, v) => spark.conf.set(k, v) }
      try f finally pairs.foreach { case (k, _) => spark.conf.unset(k) }
    }

  /** lineitem fixture with 2-decimal prices (cents-exact doubles) and
    * a planted NULL-price residue. */
  private def li(ids: Range) = {
    import spark.implicits._
    ids.map { i =>
      (((i.toLong * 7919) % 2000), (i.toLong * 104729) % 15000,
        (i % 100).toLong, (i % 50 + 1).toDouble,
        if (i % 89 == 0) None
        else Some(((i.toLong * 6007) % 900000 + 10000) / 100.0),
        Seq("A", "N", "R")(i % 3))
    }.toDF("l_partkey", "l_orderkey", "l_suppkey", "l_quantity",
      "l_extendedprice", "l_returnflag")
  }

  private def scans(p: SparkPlan): Seq[FileSourceScanExec] = fileScans(p)

  private def zoneIndexOf(df: DataFrame): ZoneMapFileIndex = {
    val ss = scans(df.queryExecution.executedPlan)
    assert(ss.nonEmpty, "the query must contain a file scan")
    val loc = ss.head.relation.location
    assert(loc.isInstanceOf[ZoneMapFileIndex],
      s"the decimal table's scan must run over the zone-mapped " +
        s"FileIndex, got ${loc.getClass.getName}")
    loc.asInstanceOf[ZoneMapFileIndex]
  }

  test("q180: a DECIMAL range predicate prunes files off exact " +
      "DecimalZone bounds and equals the raw-table computation") {
    val dir = TempDirs.create("graft_zdec_corp")
    li(0 until 20000).write.mode("overwrite")
      .parquet(s"$dir/lineitem.parquet")
    withConfs("spark.graft.zindex.dir" -> TempDirs.create("graft_zdec_root")) {
      ZIndex.clearMemo()
      val df = ZCatalog.q180ZdecimalSql(spark, dir)
      val rows = df.collect().toSeq
      val idx = zoneIndexOf(df)

      // the driver-side consult under the same cents cuts
      val t = ZIndex.LineitemDec
      val entries = ZIndex.resolveEntries(spark, dir, t)
      val (plo, phi) = ZIndex.globalDec(spark, dir, t, entries,
        "l_extendedprice")
      val lo = plo.movePointRight(2).longValueExact()
      val hi = phi.movePointRight(2).longValueExact()
      val yloC = lo + (hi - lo) * 2 / 10
      val yhiC = lo + (hi - lo) * 3 / 10
      val ylo = java.math.BigDecimal.valueOf(yloC, 2)
      val yhi = java.math.BigDecimal.valueOf(yhiC, 2)
      val expectKept = entries.count(e =>
        e.cols("l_extendedprice") match {
          case DecimalZone(zlo, zhi, _) =>
            zhi.compareTo(ylo) >= 0 && zlo.compareTo(yhi) <= 0
          case AllNullZone => false
          case _ => true
        })
      assert(idx.lastKept.get() === expectKept.toLong,
        s"planner kept ${idx.lastKept.get()} vs consult $expectKept")
      assert(idx.lastKept.get() < idx.lastTotal.get() / 2,
        s"a 10% price band over the price-clustered layout must prune " +
          s"most files, kept ${idx.lastKept.get()} of ${idx.lastTotal.get()}")

      // the raw-table truth with the same cents arithmetic
      val raw = spark.read.parquet(s"$dir/lineitem.parquet")
        .withColumn("qty", col("l_quantity").cast("decimal(18,2)"))
        .withColumn("price", col("l_extendedprice").cast("decimal(18,2)"))
      val truth = raw
        .filter(col("price") >= lit(ylo) && col("price") <= lit(yhi))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("qty")).cast("double").as("sum_qty"),
          min(col("price")).cast("double").as("min_price"),
          max(col("price")).cast("double").as("max_price"),
          countDistinct(col("l_suppkey")).as("n_supp"))
        .orderBy(col("l_returnflag")).collect().toSeq
      assert(rows.nonEmpty && rows === truth)
    }
  }

  test("q181: MIN/MAX over decimal measures metadata-serve with the " +
      "outer CAST evaluated on the driver; COUNT(col) exact over the " +
      "planted NULL prices") {
    val dir = TempDirs.create("graft_zdec_corp2")
    li(0 until 12000).write.mode("overwrite")
      .parquet(s"$dir/lineitem.parquet")
    withConfs("spark.graft.zindex.dir" -> TempDirs.create("graft_zdec_root2")) {
      ZIndex.clearMemo()
      val n0 = graft.plans.ZoneAggServe.servedCount.get()
      val df = ZCatalog.q181ZdecimalStats(spark, dir)
      val rows = df.collect().toSeq
      assert(scans(df.queryExecution.executedPlan).isEmpty,
        "the decimal stats heartbeat must contain NO file scan")
      assert(graft.plans.ZoneAggServe.servedCount.get() > n0,
        "the metadata-serve rewrite must have fired")
      val raw = spark.read.parquet(s"$dir/lineitem.parquet")
      val truth = raw.agg(
        count(lit(1)).as("n_rows"),
        count(col("l_extendedprice")).as("n_price"),
        min(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
          .as("min_price"),
        max(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
          .as("max_price"),
        min(col("l_quantity").cast("decimal(18,2)")).cast("double")
          .as("min_qty"),
        max(col("l_quantity").cast("decimal(18,2)")).cast("double")
          .as("max_qty")).collect().toSeq
      assert(rows === truth)
      // the fixture's planted NULLs must make COUNT(col) < COUNT(*)
      assert(rows.head.getAs[Long]("n_price") <
        rows.head.getAs[Long]("n_rows"))
    }
  }

  test("the decimal zones themselves carry exact bounds and null " +
      "counts read from the footers") {
    val dir = TempDirs.create("graft_zdec_corp3")
    li(0 until 6000).write.mode("overwrite")
      .parquet(s"$dir/lineitem.parquet")
    withConfs("spark.graft.zindex.dir" -> TempDirs.create("graft_zdec_root3")) {
      ZIndex.clearMemo()
      val entries = ZIndex.resolveEntries(spark, dir, ZIndex.LineitemDec)
      val zones = entries.map(_.cols("l_extendedprice"))
      assert(zones.forall {
        case DecimalZone(lo, hi, n) => lo.compareTo(hi) <= 0 && n >= 0
        case AllNullZone => true
        case z => fail(s"expected a DecimalZone, got $z")
      })
      val nulls = zones.collect { case DecimalZone(_, _, n) => n }.sum
      val rawNulls = spark.read.parquet(s"$dir/lineitem.parquet")
        .filter(col("l_extendedprice").isNull).count()
      // all-null files (if any) account for the rest
      val allNullRows = entries.collect {
        case e if e.cols("l_extendedprice") == AllNullZone => e.rows
      }.sum
      assert(nulls + allNullRows === rawNulls,
        "footer null counts must sum to the raw table's null count")
    }
  }
}
