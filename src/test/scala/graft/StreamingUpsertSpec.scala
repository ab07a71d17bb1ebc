package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.streaming.EventsStream

class StreamingUpsertSpec extends SparkSpec {

  test("foreachBatch streaming upsert converges to the batch rollup and is idempotent") {
    val out = TempDirs.create("graft_stream_gold") + "/" + "gold"
    EventsStream.streamingUpsertGold(spark, Sf, out)
    val streamed = spark.read.parquet(out)
    val batch = Tables.events(spark, Sf)
      .groupBy(date_trunc("hour", col("ts")).as("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
    assert(streamed.count() === batch.count())
    assert(streamed.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(streamed).count() === 0)

    // replaying the whole stream upserts the same keys — still equal
    EventsStream.streamingUpsertGold(spark, Sf, out)
    val again = spark.read.parquet(out)
    assert(again.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(again).count() === 0)
  }
}
