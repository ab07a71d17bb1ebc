package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Multimodal-column plumbing: media as opaque `binary` payloads with
  * typed metadata, batched decode/feature-extraction over partitions.
  *
  * The decode step itself is STUBBED (this container has no image/audio
  * codecs — a production build would swap [[decodePartition]]'s body for
  * real codec calls); everything Spark-side — schema, binary columns,
  * partition-batched UDF shape, deterministic fake features — is real and
  * tested (MultimodalSpec).
  *
  * Scale notes: payloads stay opaque bytes end-to-end (no driver
  * collection); decode is `mapPartitions` so codec init cost amortizes per
  * partition (the Scala analogue of a Pandas-batched UDF); metadata-only
  * queries never touch payload bytes thanks to Parquet column pruning —
  * keep payloads in their own column so scans of width/height/type read
  * kilobytes, not the blobs.
  */
object MultimodalOps {

  /** Synthesize a media table from documents: payload = utf-8 bytes of the
    * text (stand-in for image/audio/video bytes), media_type and nominal
    * dimensions derived deterministically from doc_id.
    */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
      col("text").cast("binary").as("payload"),
      ((col("doc_id") % 64) * 16 + 256).cast("int").as("width"),
      ((col("doc_id") % 36) * 16 + 144).cast("int").as("height"),
      when(col("doc_id") % 3 === 1, 44100).otherwise(lit(null).cast("int")).as("sample_rate"))

  final case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte],
      width: Int, height: Int)
  final case class MediaFeatures(doc_id: Long, media_type: String, n_bytes: Int,
      checksum_first: Int, byte_mean: Double, embedding: Array[Float])

  /** Batched decode + feature extraction. STUB: a real implementation
    * decodes payload with a codec and runs a vision/audio model; this
    * deterministic fake derives features from the raw bytes so the
    * pipeline shape (per-partition batching, typed output schema,
    * downstream joins) is fully exercised.
    */
  def decodePartition(rows: Iterator[MediaRow]): Iterator[MediaFeatures] =
    rows.map { r =>
      val bytes = r.payload
      var sum = 0L
      var i = 0
      while (i < bytes.length) { sum += bytes(i) & 0xFF; i += 1 }
      val mean = if (bytes.length == 0) 0.0 else sum.toDouble / bytes.length
      // fake embedding: 8 dims from byte statistics of fixed strides (STUB
      // for a model forward pass)
      val emb = Array.tabulate(8) { d =>
        var acc = 0L
        var j = d
        while (j < bytes.length) { acc += bytes(j) & 0xFF; j += 8 }
        acc.toFloat / math.max(1, bytes.length / 8).toFloat
      }
      MediaFeatures(r.doc_id, r.media_type, bytes.length,
        if (bytes.isEmpty) 0 else bytes(0) & 0xFF, mean, emb)
    }

  /** The full decode pipeline as a Dataset transformation. */
  def extractFeatures(spark: SparkSession, dir: String): Dataset[MediaFeatures] = {
    import spark.implicits._
    mediaTable(spark, dir)
      .select(col("doc_id"), col("media_type"), col("payload"), col("width"), col("height"))
      .as[MediaRow]
      .mapPartitions(decodePartition _)
  }

  /** Metadata-only stats (never touches payload bytes on a real layout). */
  def q52MultimodalMeta(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .groupBy(col("media_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(length(col("payload"))).as("total_bytes"),
        min(md5(col("payload"))).as("min_checksum"),
        max(col("width")).as("max_width"),
        max(col("height")).as("max_height"),
        count(col("sample_rate")).as("n_with_rate"))
      .orderBy(col("media_type"))

  val q52Sql: String =
    """WITH media AS (
      |  SELECT doc_id,
      |    ['image','audio','video'][CAST(doc_id % 3 + 1 AS INT)] AS media_type,
      |    encode(text) AS payload,
      |    md5(text) AS payload_md5, -- DuckDB md5 lacks a BLOB overload; payload IS utf8(text)
      |    CAST((doc_id % 64) * 16 + 256 AS INT) AS width,
      |    CAST((doc_id % 36) * 16 + 144 AS INT) AS height,
      |    CASE WHEN doc_id % 3 = 1 THEN 44100 ELSE NULL END AS sample_rate
      |  FROM documents)
      |SELECT media_type, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(octet_length(payload)) AS BIGINT) AS total_bytes,
      |  MIN(payload_md5) AS min_checksum,
      |  MAX(width) AS max_width, MAX(height) AS max_height,
      |  CAST(COUNT(sample_rate) AS BIGINT) AS n_with_rate
      |FROM media GROUP BY media_type ORDER BY media_type""".stripMargin
}
