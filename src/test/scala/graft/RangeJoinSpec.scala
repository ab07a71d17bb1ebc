package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin
import graft.sources.Tables

/** Binned range join: equal to the naive BETWEEN join, planned as a hash
  * equi-join; plus a seeded random cover property on the bin arithmetic
  * (events/intervals with adversarial boundary alignment).
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def intervals() = Tables.nation(spark, Sf).select(
    col("n_nationkey").as("window_id"),
    expr("timestamp'2024-01-01 00:00:00' + make_interval(0, 0, 0, 0, n_nationkey * 28, 0, 0)").as("start_ts"),
    expr("timestamp'2024-01-01 00:00:00' + make_interval(0, 0, 0, 0, n_nationkey * 28 + 6, 0, 0)").as("end_ts"))

  test("binned range join equals the naive BETWEEN join") {
    val ev = Tables.events(spark, Sf).select("event_id", "ts")
    val binned = RangeJoin.binnedRangeJoin(ev, "ts", intervals(),
      "start_ts", "end_ts", binMicros = 6L * 3600 * 1000000)
      .select("event_id", "window_id")
    val naive = ev.join(intervals(),
        col("ts") >= col("start_ts") && col("ts") <= col("end_ts"))
      .select("event_id", "window_id")
    assert(binned.count() > 0)
    assert(binned.exceptAll(naive).count() === 0)
    assert(naive.exceptAll(binned).count() === 0)
  }

  test("binned range join plans as a hash equi-join on __bin") {
    val plan = RangeJoin.binnedRangeJoin(Tables.events(spark, Sf), "ts",
        intervals(), "start_ts", "end_ts", binMicros = 6L * 3600 * 1000000)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin"), plan)
  }

  test("cover property: random bins/intervals, boundary-aligned included") {
    val rnd = new scala.util.Random(7)
    val base = 1700000000000000L // µs epoch
    // adversarial: interval ends exactly on bin edges, facts exactly on
    // interval bounds, plus uniform noise
    val ivs = (0 until 20).map { i =>
      val s = base + rnd.nextInt(1000000) * 1000L
      val e = s + (if (i % 3 == 0) 6L * 3600 * 1000000 else rnd.nextInt(7200) * 1000000L)
      (i.toLong, new java.sql.Timestamp(s / 1000), new java.sql.Timestamp(e / 1000))
    }
    val facts = ivs.flatMap { case (i, s, e) =>
      Seq((i * 10, s), (i * 10 + 1, e), // exact bounds
        (i * 10 + 2, new java.sql.Timestamp(s.getTime + rnd.nextInt(7200) * 1000L)))
    }
    val fDf = facts.toDF("event_id", "ts")
    val iDf = ivs.toDF("window_id", "start_ts", "end_ts")
    val binned = RangeJoin.binnedRangeJoin(fDf, "ts", iDf, "start_ts", "end_ts",
      binMicros = 3600L * 1000000).select("event_id", "window_id")
    val naive = fDf.join(iDf, col("ts") >= col("start_ts") && col("ts") <= col("end_ts"))
      .select("event_id", "window_id")
    assert(binned.exceptAll(naive).count() === 0)
    assert(naive.exceptAll(binned).count() === 0)
  }
}
