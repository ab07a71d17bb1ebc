package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.streaming.EventsStream

/** State-store portability — the 100 TB/day posture item the default
  * config hides: `HDFSBackedStateStoreProvider` keeps every key's state
  * in executor HEAP (fine for the test corpus, an OOM at production key
  * cardinality), while `RocksDBStateStoreProvider` spills state to local
  * disk with the same exactly-once semantics. The engine's stateful
  * operators must not care which provider runs underneath; this spec
  * runs the two heaviest state shapes — windowed aggregation and the
  * watermarked stream-stream join — on RocksDB and asserts results
  * identical to batch semantics (the same oracles q51/q64 pin on the
  * default provider).
  */
class RocksDbStateSpec extends SparkSpec {

  private def withRocksDb[T](f: org.apache.spark.sql.SparkSession => T): T =
    withCustomSession(_
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.ui.enabled", "false"))(f)

  test("windowed aggregation on RocksDB state equals the batch rollup") {
    withRocksDb { s =>
      val streamed = EventsStream.runWindowAggOnce(s, Sf, "rocksdb_win_agg")
      val batch = Tables.events(s, Sf)
        .groupBy(date_trunc("hour", col("ts")).as("window_start"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      assert(streamed.count() === batch.count())
      assert(streamed.exceptAll(batch).count() === 0 &&
             batch.exceptAll(streamed).count() === 0,
        "RocksDB-backed windowed agg must equal the batch rollup")
    }
  }

  /** The composition that IS production recovery: checkpointed restart
    * (StreamingRecoverySpec's contract) with the state store that holds
    * production-size state. Across the stop/restart the window counts
    * must reload from the RocksDB snapshot+changelog in the checkpoint —
    * equality with the batch rollup is impossible otherwise (cross-
    * tranche windows would undercount).
    */
  test("checkpointed restart recovers RocksDB state: two-tranche upsert equals batch") {
    withRocksDb { s =>
      val base = TempDirs.create("graft_rocksdb_recovery_")
      val (feed, ckpt, gold) = (s"$base/feed", s"$base/ckpt", s"$base/gold")
      val raw = graft.sources.Tables.eventsRawNanos(s, Sf)
      val (t1, t2) = EventsStream.recoverySplit(raw)
      EventsStream.landFeedFile(t1, feed, "t1")
      EventsStream.streamingUpsertGoldTranche(s, feed, ckpt, gold)
      EventsStream.landFeedFile(t2, feed, "t2")
      EventsStream.streamingUpsertGoldTranche(s, feed, ckpt, gold)
      val got = s.read.parquet(gold)
      val batch = Tables.events(s, Sf)
        .groupBy(date_trunc("hour", col("ts")).as("window_start"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      assert(got.exceptAll(batch).count() === 0 && batch.exceptAll(got).count() === 0,
        "RocksDB-backed restart must converge to the whole-corpus batch rollup")
    }
  }

  test("stream-stream join on RocksDB state equals the batch self-join") {
    withRocksDb { s =>
      val streamed = EventsStream.runStreamJoinOnce(s, Sf, "rocksdb_join")
      val e = Tables.events(s, Sf)
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id").as("pu"), col("event_id").as("purchase_id"),
          col("ts").as("purchase_ts"))
      val batch = clicks.join(purchases,
          col("user_id") === col("pu") &&
          col("purchase_ts") >= col("click_ts") &&
          col("purchase_ts") <= col("click_ts") + expr("INTERVAL 60 MINUTES"))
        .select(col("user_id"), col("click_id"), col("purchase_id"),
          expr("(unix_micros(purchase_ts) - unix_micros(click_ts)) div 1000000").as("lag_s"))
      assert(streamed.count() === batch.count())
      assert(streamed.exceptAll(batch).count() === 0 &&
             batch.exceptAll(streamed).count() === 0,
        "RocksDB-backed stream-stream join must equal the batch self-join")
    }
  }
}
