package graft

import java.sql.Timestamp
import graft.operators.AsofJoin

/** Unit semantics of the generic as-of join on a crafted dataset: no
  * prior row → NULLs, tolerance cutoff, equal-ts visibility, tie-break,
  * atomic carry.
  */
class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("nearest prior within tolerance, exact-ts visible, ties on tie column") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")), // prior at 09:00 → matched
      (1L, 11L, ts("2024-01-01 09:00:00")), // exactly at right ts → visible
      (1L, 12L, ts("2024-01-01 08:00:00")), // nothing prior → NULL
      (2L, 20L, ts("2024-01-01 23:00:00")), // prior at 09:30 but > 2h → NULL
      (3L, 30L, ts("2024-01-01 10:00:00"))  // two rights at same ts → highest tie wins
    ).toDF("user_id", "click_id", "ts")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), 1.5, 100L),
      (2L, ts("2024-01-01 09:30:00"), 2.5, 101L),
      (3L, ts("2024-01-01 09:45:00"), 3.5, 102L),
      (3L, ts("2024-01-01 09:45:00"), 4.5, 103L)
    ).toDF("user_id", "vts", "value", "event_id")

    val out = AsofJoin.nearestPrior(left, right, Seq("user_id"), "ts", "vts",
        payloadCols = Seq("value"), toleranceMicros = Some(2L * 3600 * 1000000),
        rightTieCol = Some("event_id"))
      .collect().map(r => r.getAs[Long]("click_id") ->
        (Option(r.getAs[Timestamp]("matched_ts")), Option(r.getAs[Any]("asof_value"))))
      .toMap

    assert(out(10L) === (Some(ts("2024-01-01 09:00:00")), Some(1.5)))
    assert(out(11L) === (Some(ts("2024-01-01 09:00:00")), Some(1.5)))
    assert(out(12L) === (None, None))
    assert(out(20L) === (None, None))
    assert(out(30L) === (Some(ts("2024-01-01 09:45:00")), Some(4.5))) // event_id 103 wins
  }

  test("one shuffle: the plan has a single exchange on the key") {
    val left = Seq((1L, 1L, ts("2024-01-01 10:00:00"))).toDF("user_id", "click_id", "ts")
    val right = Seq((1L, ts("2024-01-01 09:00:00"), 1.0, 1L))
      .toDF("user_id", "vts", "value", "event_id")
    val plan = AsofJoin.nearestPrior(left, right, Seq("user_id"), "ts", "vts",
        Seq("value"), None, None)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan) // no join operator at all
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges === 1, plan)
  }
}
