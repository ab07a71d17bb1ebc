package graft

import org.apache.spark.sql.functions._

import graft.operators.KmvTable
import graft.plans.{SynopsisStats, ValueSynopsis}

/** r11 verdict #3 — catalog statistics refreshed FROM maintenance: a
  * consumer registers its injection ([[SynopsisStats.registerRefresh]])
  * and every sketch-table commit that wrote re-fires it, so an append
  * updates the registered tables' rowCount / histogram in the same
  * call that updated the sketches — no ANALYZE, no second feed scan,
  * and the stale window is zero beyond the maintenance run itself.
  * Pinned through Spark's own consumption: after the append, a
  * FilterEstimation probe over the registered table must read the NEW
  * histogram (the probe predicate selects nothing under tranche 1's
  * value range and ~all of tranche 2's).
  */
class StatsRefreshSpec extends SparkSpec {

  test("maintain-append re-fires registered injections: rowCount moves, " +
      "FilterEstimation reads the new histogram; no-op maintenance fires nothing") {
    import spark.implicits._
    def ev(ids: Range, day: String, vbase: Long) = ids.map { i =>
      (i.toLong, java.sql.Timestamp.valueOf(s"$day 09:00:00"),
        (i % 40).toLong, "view", (vbase + i % 100).toDouble)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    val dir = TempDirs.create("graft_refresh_corp")
    // tranche 1: values 0..99 (cents 0..9900) — nothing >= the probe
    ev(1 to 300, "2024-03-01", 0L).coalesce(1)
      .write.parquet(s"$dir/events.parquet")
    spark.conf.set("spark.graft.kmv.tableDir", TempDirs.create("graft_refresh_tbl"))
    spark.sql("DROP TABLE IF EXISTS refr_t")
    try {
      KmvTable.maintain(spark, dir).count() // initial build (pre-registration)
      Seq(1L, 2L, 3L).toDF("v").write.saveAsTable("refr_t")
      def injectNow(sp: org.apache.spark.sql.SparkSession): Unit = {
        val vs = ValueSynopsis.fromTable(sp, dir)("view")
        SynopsisStats.inject(sp, "refr_t", vs.rows, Map.empty,
          extraCols = Map("v" -> SynopsisStats.valueStat(vs)))
      }
      var fired = 0
      SynopsisStats.registerRefresh(dir, "spec_refresh") { sp =>
        fired += 1; injectNow(sp)
      }
      injectNow(spark) // the registrant's own initial injection
      def catStats() = spark.sessionState.catalog
        .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier("refr_t"))
        .stats.get
      def probeEst(): BigInt = {
        spark.conf.set("spark.sql.cbo.enabled", "true")
        try spark.table("refr_t").filter(col("v") >= lit(15000L))
          .queryExecution.optimizedPlan.stats.rowCount.get
        finally spark.conf.unset("spark.sql.cbo.enabled")
      }
      val r1 = catStats().rowCount.get
      assert(r1 === BigInt(300))
      val est1 = probeEst()
      // no-op maintenance: nothing written, nothing re-fired
      KmvTable.maintain(spark, dir).count()
      assert(fired === 0, "the no-op fast path must not fire refreshers")

      // tranche 2: values 400..499 (cents 40000..49900) — all >= probe
      graft.streaming.EventsStream.landFeedFile(
        ev(301 to 500, "2024-03-02", 400L), s"$dir/events.parquet", "t2")
      KmvTable.maintain(spark, dir).count() // append commit fires the hook
      assert(fired === 1, "the append commit must fire the refresher once")
      val r2 = catStats().rowCount.get
      assert(r2 === BigInt(500),
        s"rowCount must track the appended population, got $r2")
      // the histogram Catalyst reads is the refreshed one: its span now
      // reaches tranche 2's values
      val hi = catStats().colStats("v").histogram.get.bins.last.hi
      assert(hi > 39999.0, s"refreshed histogram must cover tranche 2, hi=$hi")
      // ... and FilterEstimation consumes it: the probe selects ~all of
      // tranche 2 where it selected ~nothing before
      val est2 = probeEst()
      assert(est2.toLong >= 100 && est2.toLong <= 300,
        s"post-append estimate must land on tranche 2's mass, got $est2 (was $est1)")
      assert(est2 > est1 * 10 || est1 <= BigInt(1),
        s"estimate must move with the refreshed histogram: $est1 -> $est2")
    } finally {
      SynopsisStats.clearRefresh()
      spark.conf.unset("spark.graft.kmv.tableDir")
      spark.sql("DROP TABLE IF EXISTS refr_t")
    }
  }
}
