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

  test("stream-static enrichment equals the batch join + rollup") {
    val streamed = EventsStream.runStreamEnrichOnce(spark, Sf, "t_stream_enrich")
    val dim = Tables.customer(spark, Sf).select(col("c_custkey"), col("c_mktsegment"))
    val batch = Tables.events(spark, Sf)
      .join(dim, col("user_id") === col("c_custkey"))
      .groupBy(date_trunc("hour", col("ts")).as("window_start"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
    assert(streamed.count() === batch.count())
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

  test("session_window merges an event arriving exactly at the gap boundary") {
    import spark.implicits._
    // user 1: second event exactly 30min after the first -> start == current
    // session end -> MERGES (Spark splits only on start > end); user 2: 1 us
    // past the boundary -> two sessions. This is the boundary the q87
    // gaps-and-islands oracle encodes with a strict > on the lag.
    val df = Seq(
      (1L, "2024-01-01 12:00:00"), (1L, "2024-01-01 12:30:00"),
      (2L, "2024-01-01 12:00:00"), (2L, "2024-01-01 12:30:00.000001"))
      .toDF("user_id", "s").withColumn("ts", col("s").cast("timestamp"))
    val out = df.groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(out.filter(_._1 == 1L).map(_._2).toSeq === Seq(2L), out.mkString(","))
    assert(out.filter(_._1 == 2L).map(_._2).sorted.toSeq === Seq(1L, 1L), out.mkString(","))
  }
}
