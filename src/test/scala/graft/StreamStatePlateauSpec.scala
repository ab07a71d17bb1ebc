package graft

import org.apache.spark.sql.functions._
import graft.streaming.EventsStream

/** The PLANS §r8 streaming-state claim, as CI instead of prose: the q64
  * join's watermark must BOUND state — across a multi-batch tranche
  * drive, state rows plateau at O(rate × horizon) and evicted rows
  * track arrivals, instead of state accumulating the whole stream. The
  * sf10 measurement showed a 6%-band plateau over 23 batches; at gate
  * scale the band is looser (hundreds of rows per tranche) so the
  * assertions are structural: no cumulative growth across the data
  * batches, and most of the stream evicted by the end. RocksDB provider,
  * same as the measurement.
  */
class StreamStatePlateauSpec extends SparkSpec {

  test("q64 join state plateaus and evicts under the watermark across tranches") {
    withCustomSession(_
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.ui.enabled", "false")) { s =>
      val base = TempDirs.create("graft_plateau")
      val (feedDir, ckpt, out) = (s"$base/feed", s"$base/ckpt", s"$base/out")
      val raw = graft.sources.Tables.eventsRawNanos(s, Sf)
        .withColumn("__t", ntile(6).over(
          org.apache.spark.sql.expressions.Window.orderBy(col("ts"), col("event_id"))))
      for (i <- 1 to 6)
        EventsStream.landFeedFile(
          raw.filter(col("__t") === i).drop("__t"), feedDir, f"tranche$i%03d")
      val q = EventsStream.meteredJoinQuery(s, feedDir, ckpt, out, maxFilesPerTrigger = 1)
      q.awaitTermination()
      val progress = q.recentProgress.toSeq
      val states = progress.flatMap(_.stateOperators.headOption.map(_.numRowsTotal))
      val evicted = progress.flatMap(_.stateOperators.headOption.map(_.numRowsRemoved)).sum
      val inputs = progress.map(_.numInputRows)
      // the self-join scans the one feed TWICE per batch (clicks branch +
      // purchases branch), so reported input rows are 2x the corpus
      val total = inputs.sum / 2
      assert(total === raw.count(), "every tranche row must be consumed")
      // no cumulative growth: the plateau claim — state after the last
      // DATA batch stays in the same regime as after the first, rather
      // than tracking the stream (6 tranches -> 6x growth would fail)
      val dataStates = states.zip(inputs).filter(_._2 > 0).map(_._1)
      assert(dataStates.size >= 5)
      assert(dataStates.last <= 2 * dataStates.head,
        s"state grew across tranches: $dataStates")
      assert(states.max <= total / 2, s"state ${states.max} tracks the stream ($total rows)")
      // the 2 h tolerance is tiny against the corpus's multi-day span:
      // most of what ENTERS state (only click/purchase rows do) must
      // have been evicted by the end
      val entering = raw.filter(col("event_type").isin("click", "purchase")).count()
      assert(evicted >= (entering * 6) / 10, s"evicted $evicted of $entering entering")
    }
  }
}
