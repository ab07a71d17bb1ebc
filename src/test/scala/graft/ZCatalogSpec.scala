package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.functions._

import graft.operators.{ZCatalog, ZIndex}
import graft.plans.{AllNullZone, LongZone, StringZone, ZoneMapFileIndex,
  ZoneMapScanSwap}

/** q176 — the z-layout's catalog face. Pins:
  * (1) the plain-SQL query (no graft API in the query text) equals the
  *     same computation off the raw table;
  * (2) the EXECUTED plan's file scan runs over [[ZoneMapFileIndex]] —
  *     the swap rule fired — and its kept set is exactly the
  *     driver-side consult of the same entries under the query's
  *     BETWEEN + range + IN predicates;
  * (3) an arbitrary second SQL query over the same table (a point
  *     lookup the harness never anticipated) also prunes and matches
  *     the raw table — the face serves ANY consumer, not one query. */
class ZCatalogSpec extends SparkSpec {

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
        Seq("A", "N", "R")(i % 3))
    }.toDF("l_partkey", "l_orderkey", "l_suppkey", "l_quantity",
      "l_returnflag")
  }

  private def zoneScans(p: SparkPlan): Seq[FileSourceScanExec] = fileScans(p)

  private def zoneIndexOf(df: DataFrame): ZoneMapFileIndex = {
    val scans = zoneScans(df.queryExecution.executedPlan)
    assert(scans.nonEmpty, "the query must contain a file scan")
    val loc = scans.head.relation.location
    assert(loc.isInstanceOf[ZoneMapFileIndex],
      s"the catalog table's scan must run over the zone-mapped " +
        s"FileIndex, got ${loc.getClass.getName}")
    loc.asInstanceOf[ZoneMapFileIndex]
  }

  test("q176: plain SQL over the catalog table prunes through the " +
      "swapped FileIndex and equals the raw-table computation") {
    val dir = TempDirs.create("graft_zcat_corp")
    li(0 until 20000).write.mode("overwrite")
      .parquet(s"$dir/lineitem.parquet")
    withConfs("spark.graft.zindex.dir" -> TempDirs.create("graft_zcat_root")) {
      ZIndex.clearMemo()
      val df = ZCatalog.q176ZorderSql(spark, dir)
      val rows = df.collect().toSeq
      val idx = zoneIndexOf(df)

      // driver-side consult of the same entries under the query's
      // predicates: orderkey BETWEEN (deciles 3..4), partkey < decile
      // 6 cut, returnflag IN ('A','R')
      val entries = ZIndex.resolveEntries(spark, dir)
      val (plo, phi) = ZIndex.globalLong(spark, dir, ZIndex.Lineitem,
        entries, "l_partkey")
      val (olo, ohi) = ZIndex.globalLong(spark, dir, ZIndex.Lineitem,
        entries, "l_orderkey")
      val xmid = plo + (phi - plo) * 6 / 10
      val ylo = olo + (ohi - olo) * 3 / 10
      val yhi = olo + (ohi - olo) * 4 / 10
      val expectKept = entries.count { e =>
        val oOk = e.cols("l_orderkey") match {
          case LongZone(lo, hi, _) => lo <= yhi && hi >= ylo
          case AllNullZone => false
          case _ => true
        }
        val pOk = e.cols("l_partkey") match {
          case LongZone(lo, _, _) => lo < xmid
          case AllNullZone => false
          case _ => true
        }
        val fOk = e.cols("l_returnflag") match {
          case StringZone(lo, hi, _) =>
            Seq("A", "R").exists(v => lo <= v && v <= hi)
          case AllNullZone => false
          case _ => true
        }
        oOk && pOk && fOk
      }
      assert(idx.lastKept.get() === expectKept.toLong,
        s"planner kept ${idx.lastKept.get()} vs consult $expectKept")
      assert(idx.lastKept.get() < idx.lastTotal.get(),
        "the band + range predicates must prune the layout")

      // the raw-table truth with the same cut points
      val raw = spark.read.parquet(s"$dir/lineitem.parquet")
      val truth = raw
        .filter(col("l_orderkey") >= ylo && col("l_orderkey") <= yhi &&
          col("l_partkey") < xmid && col("l_returnflag").isin("A", "R"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
            .as("sum_qty"),
          countDistinct(col("l_suppkey")).as("n_supp"))
        .orderBy(col("l_returnflag")).collect().toSeq
      assert(rows.nonEmpty && rows === truth)
    }
  }

  test("q176: an arbitrary second SQL query over the same table — a " +
      "point lookup — prunes hard and matches the raw table") {
    val dir = TempDirs.create("graft_zcat_corp2")
    li(0 until 16000).write.mode("overwrite")
      .parquet(s"$dir/lineitem.parquet")
    withConfs("spark.graft.zindex.dir" -> TempDirs.create("graft_zcat_root2")) {
      ZIndex.clearMemo()
      ZCatalog.q176ZorderSql(spark, dir).collect() // registers the table
      val tbl = ZCatalog.ensureRegistered(spark, dir)
      val raw = spark.read.parquet(s"$dir/lineitem.parquet")
      val k = raw.agg(min(col("l_orderkey"))).collect()(0).getLong(0)
      val df = spark.sql(
        s"SELECT COUNT(*) AS n FROM $tbl WHERE l_orderkey = $k")
      val n = df.collect()(0).getLong(0)
      val idx = zoneIndexOf(df)
      assert(n === raw.filter(col("l_orderkey") === k).count())
      assert(n > 0)
      assert(idx.lastKept.get() < idx.lastTotal.get() / 2,
        s"a point lookup on the clustered dimension must prune most " +
          s"files, kept ${idx.lastKept.get()} of ${idx.lastTotal.get()}")
    }
  }

  test("a SECOND z-table (orders) rides the same machinery: schema-" +
      "driven zones for its own columns, catalog face, and counters " +
      "independent of the lineitem relation's") {
    val dir = TempDirs.create("graft_zcat_corp5")
    li(0 until 6000).write.mode("overwrite")
      .parquet(s"$dir/lineitem.parquet")
    import spark.implicits._
    (0 until 6000).map { i =>
      ((i.toLong * 7919) % 50000, (i.toLong * 104729) % 9000,
        Seq("F", "O", "P")(i % 3))
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    withConfs("spark.graft.zindex.dir" -> TempDirs.create("graft_zcat_root5")) {
      ZIndex.clearMemo()
      val ordersT = graft.operators.ZTable("orders",
        d => s"$d/orders.parquet",
        (s, d) => s.read.parquet(s"$d/orders.parquet"),
        "o_custkey", "o_orderkey", 16)
      val tbl = ZCatalog.ensureRegistered(spark, dir, ordersT)
      val liTbl = ZCatalog.ensureRegistered(spark, dir)
      try {
        val raw = spark.read.parquet(s"$dir/orders.parquet")
        val cut = raw.agg(max(col("o_custkey"))).collect()(0).getLong(0) / 10
        val df = spark.sql(s"SELECT COUNT(*) AS n FROM $tbl " +
          s"WHERE o_custkey < $cut AND o_orderstatus = 'F'")
        val n = df.collect()(0).getLong(0)
        val oIdx = zoneIndexOf(df)
        assert(n === raw.filter(col("o_custkey") < cut &&
          col("o_orderstatus") === "F").count())
        assert(oIdx.lastKept.get() < oIdx.lastTotal.get(),
          s"a 10% custkey range over the orders layout must prune " +
            s"(kept ${oIdx.lastKept.get()} of ${oIdx.lastTotal.get()})")
        // the lineitem relation keeps ITS OWN counters: a full listing
        // there must not clobber the orders observables just read.
        // (A bare COUNT(*) would be METADATA-SERVED by ZoneAggServe —
        // no scan at all — so use an always-true residual predicate to
        // force a real listing.)
        val liDf = spark.sql(
          s"SELECT COUNT(*) AS n FROM $liTbl WHERE l_suppkey >= 0")
        liDf.collect()
        val liIdx = zoneIndexOf(liDf)
        assert(liIdx.lastKept.get() === liIdx.lastTotal.get(),
          "an unrefutable predicate lists every lineitem file")
        assert(oIdx.lastKept.get() < oIdx.lastTotal.get(),
          "the orders index's counters must survive the lineitem query")
      } finally {
        spark.sql(s"DROP TABLE IF EXISTS $tbl")
        spark.sql(s"DROP TABLE IF EXISTS $liTbl"); ()
      }
    }
  }

  test("the swap rule leaves unregistered tables untouched") {
    val dir = TempDirs.create("graft_zcat_corp3")
    li(0 until 4000).write.mode("overwrite")
      .parquet(s"$dir/lineitem.parquet")
    withConfs("spark.graft.zindex.dir" -> TempDirs.create("graft_zcat_root3")) {
      ZIndex.clearMemo()
      ZCatalog.q176ZorderSql(spark, dir).collect() // arms the rule
      val plain = s"graft_zcat_plain_${System.identityHashCode(this)}"
      li(0 until 100).write.mode("overwrite")
        .parquet(s"$dir/plain.parquet")
      spark.sql(s"CREATE TABLE IF NOT EXISTS $plain " +
        s"(l_partkey BIGINT, l_orderkey BIGINT, l_suppkey BIGINT, " +
        s"l_quantity DOUBLE, l_returnflag STRING) " +
        s"USING parquet LOCATION '$dir/plain.parquet'")
      try {
        val df = spark.sql(s"SELECT COUNT(*) AS n FROM $plain")
        assert(df.collect()(0).getLong(0) === 100L)
        val scans = zoneScans(df.queryExecution.executedPlan)
        assert(scans.nonEmpty &&
          !scans.head.relation.location.isInstanceOf[ZoneMapFileIndex],
          "an unregistered table must keep its ordinary file index")
      } finally {
        spark.sql(s"DROP TABLE IF EXISTS $plain"); ()
      }
    }
  }
}
