package graft

import org.apache.spark.sql.functions._

import graft.operators.KmvTable
import graft.plans.ValueSynopsis

/** [[ValueSynopsis.fromTable]] — the feed-free ANALYZE (r11): per-type
  * column synopses (rows, NDV, min/max, sample, histogram) merged from
  * the maintained sketch table's statistics bundle, with NO corpus
  * scan beyond the maintenance pass that already happened. The pin is
  * EQUALITY, field by field including the histogram, against
  * [[ValueSynopsis.build]] run over the same population with the
  * table's k — the driver-side merge (bottom-k of disjoint daily kept
  * sets, value-KMV union-resketch, count sums, bound min/max) is exact
  * synopsis algebra, not an approximation of it.
  */
class ValueSynopsisTableSpec extends SparkSpec {

  private def withTableDir[T](f: String => T): T = {
    val dir = TempDirs.create("graft_vsyn_tbl")
    spark.conf.set("spark.graft.kmv.tableDir", dir)
    try f(dir) finally spark.conf.unset("spark.graft.kmv.tableDir")
  }

  test("fromTable equals a one-pass build over the same population, per type") {
    withTableDir { _ =>
      val fromT = ValueSynopsis.fromTable(spark, Sf)
      // the population the table's bundle is defined over: value AND
      // event_id non-null (the sample's identity/value requirements)
      val pop = graft.sources.Tables.events(spark, Sf)
        .filter(col("value").isNotNull && col("event_id").isNotNull)
      val types = pop.select(col("event_type")).distinct()
        .collect().map(_.getString(0)).toSet
      assert(fromT.keySet === types)
      types.foreach { t =>
        val direct = ValueSynopsis.build(spark, t,
          pop.filter(col("event_type") === t), col("event_id"),
          (col("value").cast("decimal(18,2)") * lit(100)).cast("long"),
          k = 64)
        val tab = fromT(t)
        assert(tab.rows === direct.rows, s"$t rows")
        assert(tab.nullCount === 0L && direct.nullCount === 0L)
        assert(tab.sample === direct.sample, s"$t sample")
        assert(tab.ndvEst === direct.ndvEst, s"$t ndv")
        assert(tab.vMin === direct.vMin && tab.vMax === direct.vMax, s"$t bounds")
        val (ht, hd) = (tab.histogram(8).get, direct.histogram(8).get)
        assert(ht.height === hd.height && ht.bins.toSeq === hd.bins.toSeq,
          s"$t histogram")
      }
    }
  }

  test("fromTable is feed-free once the table is fresh") {
    withTableDir { _ =>
      KmvTable.maintain(spark, Sf).count()
      val before = KmvTable.filesScanned.get()
      val syn = ValueSynopsis.fromTable(spark, Sf)
      assert(syn.nonEmpty)
      assert(KmvTable.filesScanned.get() === before,
        "fromTable against a fresh table must scan zero feed files")
    }
  }

  test("replayed row identities across days do not double-spend sample slots") {
    // a row identity REPLAYED on two days sits in BOTH days' kept sets;
    // the driver-side union merge must dedup (as the sketch aggregate's
    // TreeMap does) or the duplicate displaces the true k-th element —
    // the self-review catch, pinned: fromTable == build on a corpus
    // where every day-1 row is replayed on day 2
    import spark.implicits._
    def day(ids: Range, d: Int) = ids.map { i =>
      (i.toLong, java.sql.Timestamp.valueOf(f"2024-03-0$d%d 09:00:00"),
        i.toLong, "view", i.toDouble / 100.0)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    val dir = TempDirs.create("graft_vsyn_replay")
    day(1 to 100, 1).union(day(1 to 100, 2)).union(day(101 to 120, 2))
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    withTableDir { _ =>
      val tab = ValueSynopsis.fromTable(spark, dir)("view")
      val direct = ValueSynopsis.build(spark, "view",
        graft.sources.Tables.events(spark, dir)
          .filter(col("value").isNotNull && col("event_id").isNotNull),
        col("event_id"),
        (col("value").cast("decimal(18,2)") * lit(100)).cast("long"),
        k = 64)
      assert(tab.rows === 220L && direct.rows === 220L) // physical rows
      assert(tab.sample === direct.sample)
      assert(tab.sample.map(_._1).distinct.size === tab.sample.size,
        "merged sample must hold distinct row identities")
      assert(tab.ndvEst === direct.ndvEst)
      assert(tab.vMin === direct.vMin && tab.vMax === direct.vMax)
    }
  }

  test("q168's rows ARE ValueSynopsis.histogram's bins, field by field") {
    // the claim "the histogram the planner eats is gate-verified" needs
    // this bridge: the oracled q168 surface and the CatalogColumnStat
    // histogram must be the SAME artifact — same segmentation, same
    // shared-element boundary convention, same true outer bounds, same
    // height — or the gate would verify a lookalike (self-review catch)
    withTableDir { _ =>
      val fromT = ValueSynopsis.fromTable(spark, Sf)
      val byType = graft.operators.Layout
        .queries("q168_table_histogram")(spark, Sf)
        .collect().groupBy(_.getString(0))
      assert(byType.keySet === fromT.keySet)
      fromT.foreach { case (t, vs) =>
        val hist = vs.histogram(8).get
        val rows = byType(t).sortBy(r => r.getInt(r.fieldIndex("bin")))
        assert(rows.length === hist.bins.length, s"$t bin count")
        rows.zip(hist.bins).foreach { case (r, b) =>
          assert(r.getLong(r.fieldIndex("lo")).toDouble === b.lo, s"$t lo")
          assert(r.getLong(r.fieldIndex("hi")).toDouble === b.hi, s"$t hi")
          assert(r.getDouble(r.fieldIndex("height")) === hist.height,
            s"$t height")
        }
      }
    }
  }

  test("table synopsis drives Catalyst FilterEstimation without a feed scan") {
    // the end-to-end statistics story: maintained table -> fromTable ->
    // SynopsisStats.inject(valueStat histogram) -> Spark's OWN
    // FilterEstimation reads it. The injected table is a tiny stand-in
    // relation (statistics are catalog metadata — the estimate quality
    // pin lives in SynopsisHistogramSpec; here the pin is that the
    // TABLE-derived synopsis lands in the catalog and the optimizer
    // consumes it, with zero feed files scanned after freshness).
    withTableDir { _ =>
      KmvTable.maintain(spark, Sf).count()
      val before = KmvTable.filesScanned.get()
      val syn = ValueSynopsis.fromTable(spark, Sf)
      val (t, vs) = syn.maxBy(_._2.rows)
      spark.sql("DROP TABLE IF EXISTS vsyn_tbl")
      // schema-only stand-in for the type's population (v = cents)
      spark.sql("CREATE TABLE vsyn_tbl (v BIGINT) USING parquet")
      spark.conf.set("spark.sql.cbo.enabled", "true")
      try {
        graft.plans.SynopsisStats.inject(spark, "vsyn_tbl", vs.rows,
          keyCols = Map.empty,
          extraCols = Map("v" -> graft.plans.SynopsisStats.valueStat(vs)))
        val mid = (vs.vMin.get + vs.vMax.get) / 2
        val plan = spark.sql(s"SELECT * FROM vsyn_tbl WHERE v <= $mid")
          .queryExecution.optimizedPlan
        val est = plan.stats.rowCount
        assert(est.isDefined && est.get > 0 && est.get <= vs.rows,
          s"estimation must run off the injected table synopsis for $t: $est")
        assert(KmvTable.filesScanned.get() === before,
          "the whole inject+estimate path must be feed-free")
      } finally {
        spark.conf.unset("spark.sql.cbo.enabled")
        spark.sql("DROP TABLE IF EXISTS vsyn_tbl")
      }
    }
  }
}
