package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.multimodal.MultimodalOps
import graft.streaming.EventsStream

/** Streaming + multimodal driver-contract wiring. q51/q52 are oracled;
  * q53/q54 have no SQL equivalent (mapPartitions / stateful streaming) —
  * omitted from oracleSql so the driver records the weaker rows-only check.
  */
object Extras {

  private val counter = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Structured-Streaming tumbling-window agg run to completion; matches
    * the batch date_trunc oracle because complete mode emits every window.
    */
  def q51StreamWindow(spark: SparkSession, dir: String): DataFrame =
    EventsStream.runWindowAggOnce(spark, dir, s"stream_agg_${counter.incrementAndGet()}")
      .orderBy(col("window_start"), col("event_type"))

  val q51Sql: String =
    """SELECT date_trunc('hour', ts) AS window_start, event_type,
      |  CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY window_start, event_type""".stripMargin

  def q52MultimodalMeta(spark: SparkSession, dir: String): DataFrame =
    MultimodalOps.q52MultimodalMeta(spark, dir)

  def q53MultimodalFeatures(spark: SparkSession, dir: String): DataFrame =
    MultimodalOps.extractFeatures(spark, dir).toDF()
      .select(col("doc_id"), col("media_type"), col("n_bytes"),
        col("checksum_first"), col("byte_mean"), col("embedding"))
      .orderBy(col("doc_id"))

  def q54StreamSessions(spark: SparkSession, dir: String): DataFrame =
    EventsStream.runSessionizeOnce(spark, dir, s"stream_sessions_${counter.incrementAndGet()}")
      .orderBy(col("user_id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q51_stream_window"       -> (q51StreamWindow _),
    "q52_multimodal_meta"     -> (q52MultimodalMeta _),
    "q53_multimodal_features" -> (q53MultimodalFeatures _),
    "q54_stream_sessions"     -> (q54StreamSessions _),
  )

  val oracleSql: Map[String, String] = Map(
    "q51_stream_window"   -> q51Sql,
    "q52_multimodal_meta" -> MultimodalOps.q52Sql,
  )
}
