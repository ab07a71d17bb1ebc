package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** The approximate-mode rewrite at ANALYSIS phase legalizes the one
  * query Structured Streaming flatly refuses: COUNT(DISTINCT …) over a
  * stream. Flag off → the stock AnalysisException; flag on → the
  * distinct count is already a KmvSketch aggregation when the
  * streaming checker looks, so the SAME query text runs with bounded
  * state and its result matches the batch sketch-estimate definition
  * exactly (below saturation: the exact count).
  */
class StreamApproxSpec extends SparkSpec {

  test("flag off: streaming COUNT(DISTINCT) still throws the stock error") {
    withExtSession { s =>
      val events = graft.streaming.EventsStream.readEvents(s, Sf)
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        events.withWatermark("ts", "168 hours")
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count_distinct(col("user_id")).as("n"))
          .writeStream.outputMode(OutputMode.Complete)
          .format("memory").queryName("sapprox_off")
          .trigger(Trigger.AvailableNow()).start()
      }
      assert(e.getMessage.contains("Distinct aggregations are not supported"))
    }
  }

  test("flag on: the same query runs with bounded sketch state and matches batch") {
    withExtSession { s =>
      s.conf.set("spark.graft.approx.countDistinct", "true")
      try {
        val events = graft.streaming.EventsStream.readEvents(s, Sf)
        val q = events.withWatermark("ts", "168 hours")
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count_distinct(col("user_id")).as("n"))
          .select(col("window.start").as("w"), col("event_type"), col("n"))
          .writeStream.outputMode(OutputMode.Complete)
          .format("memory").queryName("sapprox_on")
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        val streamed = s.table("sapprox_on").collect()
          .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
        assert(streamed.nonEmpty)
        // batch definition under the same flag (sketch estimate; exact
        // below saturation — sf0.001 windows are tiny, so exact)
        val batch = graft.sources.Tables.events(s, Sf)
          .groupBy(date_trunc("hour", col("ts")).as("w"), col("event_type"))
          .agg(count_distinct(col("user_id")).as("n"))
          .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
        assert(streamed === batch)
        // and the state is one row per group, not per distinct user
        val states = q.recentProgress.flatMap(_.stateOperators.headOption)
        assert(states.nonEmpty)
        assert(states.map(_.numRowsTotal).max === batch.size.toLong)
      } finally s.conf.unset("spark.graft.approx.countDistinct")
    }
  }
}
