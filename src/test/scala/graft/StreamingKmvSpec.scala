package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import graft.streaming.EventsStream

/** q150 streaming KMV: the sketch must be invisible to micro-batch
  * boundaries (cap-insert is order-free and idempotent, merge is
  * associative — so a 5-tranche drip-fed run must produce the
  * byte-identical sketch to the batch bottom-k definition), and the
  * state must be BOUNDED: one state row per live (window, type) group
  * regardless of user cardinality — the whole reason the sketch is the
  * only way to ask a streaming distinct-count question at all.
  */
class StreamingKmvSpec extends SparkSpec {

  test("drip-fed streamed sketch == batch bottom-k; state rows == groups") {
    val s = spark
    val base = TempDirs.create("graft_stream_kmv")
    val feedDir = s"$base/feed"
    // 5 time-ordered tranches -> 5 data micro-batches at 1 file/trigger
    val raw = graft.sources.Tables.eventsRawNanos(s, Sf)
      .withColumn("__t", ntile(5).over(
        org.apache.spark.sql.expressions.Window.orderBy(col("ts"), col("event_id"))))
    for (i <- 1 to 5)
      EventsStream.landFeedFile(
        raw.filter(col("__t") === i).drop("__t"), feedDir, f"tranche$i%03d")
    val feed = s.readStream.schema(EventsStream.eventsSchema)
      .option("maxFilesPerTrigger", "1").parquet(feedDir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val q = EventsStream.kmvWindowAgg(s, feed).writeStream
      .outputMode(OutputMode.Complete)
      .format("memory").queryName("stream_kmv_spec")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val progress = q.recentProgress.toSeq
    assert(progress.count(_.numInputRows > 0) >= 5,
      "the run must actually span multiple data micro-batches")
    val streamed = s.table("stream_kmv_spec")
      .collect().map(r => (r.getAs[java.sql.Timestamp]("window_start"),
        r.getAs[String]("event_type")) ->
        (r.getAs[Long]("n_kept"), r.getAs[String]("hk"))).toMap
    // batch definition over the same rows
    val batch = graft.sources.Tables.events(s, Sf)
      .filter(col("user_id").isNotNull)
      .select(date_trunc("hour", col("ts")).as("w"), col("event_type"),
        md5(col("user_id").cast("string")).as("h"))
      .distinct()
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("w"), col("event_type")).orderBy(col("h"))))
      .filter(col("rn") <= 64)
      .groupBy(col("w"), col("event_type"))
      .agg(count(lit(1)).as("n_kept"), max(col("h")).as("hk"))
      .collect().map(r => (r.getAs[java.sql.Timestamp]("w"),
        r.getAs[String]("event_type")) ->
        (r.getAs[Long]("n_kept"), r.getAs[String]("hk"))).toMap
    assert(streamed === batch,
      "micro-batch boundaries must be invisible in the final sketch")
    // bounded state: exactly one row per group, NOT per distinct user
    val stateRows = progress.flatMap(_.stateOperators.headOption)
      .map(_.numRowsTotal).max
    assert(stateRows === batch.size.toLong,
      s"state must be one sketch row per (window, type) group: " +
        s"$stateRows vs ${batch.size} groups")
  }

  test("q153: drip-fed streaming priority sample == batch window-rank") {
    val s = spark
    val base = TempDirs.create("graft_stream_ps")
    val feedDir = s"$base/feed"
    val raw = graft.sources.Tables.eventsRawNanos(s, Sf)
      .withColumn("__t", ntile(4).over(
        org.apache.spark.sql.expressions.Window.orderBy(col("ts"), col("event_id"))))
    for (i <- 1 to 4)
      EventsStream.landFeedFile(
        raw.filter(col("__t") === i).drop("__t"), feedDir, f"tranche$i%03d")
    val feed = s.readStream.schema(EventsStream.eventsSchema)
      .option("maxFilesPerTrigger", "1").parquet(feedDir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val q = EventsStream.prioritySampleAgg(s, feed, 16).writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete)
      .format("memory").queryName("stream_ps_spec")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(q.recentProgress.count(_.numInputRows > 0) >= 4)
    val streamed = s.table("stream_ps_spec").collect()
      .map(r => r.getAs[String]("event_type") ->
        r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("top"))
          .map(x => (x.getString(0), x.getLong(1))).toList).toMap
    val batch = graft.sources.Tables.events(s, Sf)
      .withColumn("w", (col("value").cast("decimal(18,2)") * lit(100)).cast("long"))
      .withColumn("h48",
        expr("CAST(conv(substring(md5(CAST(event_id AS STRING)), 1, 12), 16, 10) AS BIGINT)"))
      .withColumn("p", col("w").cast("double") * lit(281474976710656.0)
        / (col("h48") + lit(1L)).cast("double"))
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("event_type"))
          .orderBy(col("p").desc, col("event_id").cast("string"))))
      .filter(col("rnk") <= 17)
      .orderBy(col("event_type"), col("rnk"))
      .collect().groupBy(_.getAs[String]("event_type"))
      .map { case (t, rs) =>
        t -> rs.map(r => (r.getAs[Long]("event_id").toString, r.getAs[Long]("w"))).toList }
    assert(streamed === batch,
      "drip-fed streaming sample must equal the batch rank definition")
  }
}
