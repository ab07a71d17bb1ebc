package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.streaming.EventsStream

/** Checkpoint-restart recovery — the last operational claim from the
  * round-4 verdict. The reference's recovery contract is task retries +
  * ON CONFLICT upserts (`dags/ingest_observations_dag.py:22-23`,
  * `README.md:269`); the engine analogue is a checkpointed streaming
  * query whose restarts are invisible in the result. This spec drives
  * the tranche machinery directly (q93 runs the same path end-to-end
  * against the DuckDB oracle) and pins each step:
  *
  *  1. after tranche 1 the gold accounts for exactly the tranche-1 rows;
  *  2. after landing tranche 2 and RESTARTING on the same checkpoint,
  *     gold equals the whole-corpus batch rollup — which is only possible
  *     if the file-source log skipped tranche 1 (re-reading would double
  *     counts into the resumed state) AND the state store resumed
  *     (losing it would undercount windows spanning both tranches);
  *  3. a third run with no new data (the reference's retry of an
  *     already-complete task) changes nothing.
  */
class StreamingRecoverySpec extends SparkSpec {

  test("checkpointed upsert resumes across restart and equals the batch rollup") {
    val base = TempDirs.create("graft_recovery_spec_")
    val (feed, ckpt, gold) = (s"$base/feed", s"$base/ckpt", s"$base/gold")

    val raw = graft.sources.Tables.eventsRawNanos(spark, Sf)
    val batch = Tables.events(spark, Sf)
      .groupBy(date_trunc("hour", col("ts")).as("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))

    val (t1, t2) = EventsStream.recoverySplit(raw)

    // run 1: first tranche of the feed, then the query STOPS (simulated
    // failure/redeploy between ingest batches)
    EventsStream.landFeedFile(t1, feed, "t1")
    EventsStream.streamingUpsertGoldTranche(spark, feed, ckpt, gold)
    val gold1 = spark.read.parquet(gold)
    val t1Rows = t1.count()
    assert(gold1.agg(sum(col("n"))).head.getLong(0) === t1Rows,
      "tranche-1 gold must account for exactly the tranche-1 events")
    assert(t1Rows < raw.count(), "split must leave work for the restart")
    // the restart must exercise LATE data: tranche 2 carries stragglers
    // older than tranche 1's frontier (but inside the 168h watermark)
    assert(t2.agg(min(col("ts"))).head.getLong(0) <
           t1.agg(max(col("ts"))).head.getLong(0),
      "tranche 2 must contain in-watermark late rows")

    // run 2: land the second tranche, RESTART on the same checkpoint
    EventsStream.landFeedFile(t2, feed, "t2")
    EventsStream.streamingUpsertGoldTranche(spark, feed, ckpt, gold)
    val gold2 = spark.read.parquet(gold)
    assert(gold2.exceptAll(batch).count() === 0 && batch.exceptAll(gold2).count() === 0,
      "restarted stream must converge to the whole-corpus batch rollup")

    // run 3: no new files — the retry of a complete task is a no-op
    EventsStream.streamingUpsertGoldTranche(spark, feed, ckpt, gold)
    val gold3 = spark.read.parquet(gold)
    assert(gold3.exceptAll(batch).count() === 0 && batch.exceptAll(gold3).count() === 0,
      "no-op retry must not change the gold table")
  }

  test("stream-stream join state survives a checkpointed restart") {
    val raw = graft.sources.Tables.eventsRawNanos(spark, Sf)

    // the cut sits INSIDE the largest-lag matched pair: its click can
    // only pair with its purchase if the restarted query restored the
    // join state store from the checkpoint
    val cutNs = EventsStream.joinRecoveryCutNs(raw)
    val windowNs = 3600L * 1000000000L
    val crossPairs = raw.filter(col("event_type") === "click" && col("ts") < cutNs)
      .select(col("user_id").as("u"), col("ts").as("cts"))
      .join(raw.filter(col("event_type") === "purchase" && col("ts") >= cutNs)
        .select(col("user_id").as("u"), col("ts").as("pts")), Seq("u"))
      .filter(col("pts") >= col("cts") && col("pts") <= col("cts") + windowNs)
      .count()
    assert(crossPairs > 0, "cut must split at least one matched pair across tranches")

    val got = EventsStream.runStreamJoinRecoveryOnce(spark, Sf)
    val batch = graft.sources.Tables.events(spark, Sf)
    val clicks = batch.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))
    val purchases = batch.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("event_id").as("purchase_id"), col("ts").as("purchase_ts"))
    val expected = clicks.join(purchases,
        col("user_id") === col("pu") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL 60 MINUTES"))
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        expr("(unix_micros(purchase_ts) - unix_micros(click_ts)) div 1000000").as("lag_s"))
    assert(got.count() === expected.count(),
      "restarted join must emit exactly the batch join's pairs")
    assert(got.exceptAll(expected).count() === 0 &&
           expected.exceptAll(got).count() === 0,
      "restarted join must equal the batch self-join")
  }
}
