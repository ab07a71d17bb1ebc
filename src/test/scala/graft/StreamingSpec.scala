package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.streaming.EventsStream

class StreamingSpec extends SparkSpec {

  test("streaming windowed agg equals the batch rollup") {
    val streamed = EventsStream.runWindowAggOnce(spark, Sf, "t_stream_agg")
    val batch = Tables.events(spark, Sf)
      .groupBy(date_trunc("hour", col("ts")).as("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
    assert(streamed.count() === batch.count())
    // exceptAll both ways => identical multisets
    assert(streamed.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(streamed).count() === 0)
  }

  test("sessionize final state matches per-user batch counts") {
    val sessions = EventsStream.runSessionizeOnce(spark, Sf, "t_stream_sessions")
    val batch = Tables.events(spark, Sf).groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"), max(col("ts")).as("last_seen"))
    val joined = sessions.alias("s").join(batch.alias("b"), "user_id")
      .filter(col("s.n_events") =!= col("b.n_events") ||
        col("s.last_seen") =!= col("b.last_seen"))
    assert(sessions.count() === batch.count())
    assert(joined.count() === 0)
  }
}
