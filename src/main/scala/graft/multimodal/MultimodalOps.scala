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

  // ------------------------------------------------------------------
  // Resize (images) and frame-sampling (video) — the remaining two
  // multimodal ops. As with decode, the CODEC is the stub (a real build
  // decodes the raster / container first); the operator shape is real:
  // strided byte subsampling per partition for resize, and a 1→N
  // iterator flatMap for frame sampling (the explode-shaped output a
  // video pipeline produces). Both are deterministic byte arithmetic, so
  // both are oracle-checkable in DuckDB.
  // ------------------------------------------------------------------

  final case class ResizedMedia(doc_id: Long, out_width: Int, out_height: Int,
      out_n_bytes: Int, first_byte: Int, byte_sum: Long)
  final case class SampledFrame(doc_id: Long, frame_idx: Int, n_bytes: Int,
      first_byte: Int, byte_sum: Long)

  /** Keep every `factor`-th byte (STUB for raster downsampling); nominal
    * dims shrink by ceil-division.
    */
  def resizePartition(rows: Iterator[MediaRow], factor: Int): Iterator[ResizedMedia] =
    rows.map { r =>
      val bytes = r.payload
      var sum = 0L
      var n = 0
      var i = 0
      while (i < bytes.length) { sum += bytes(i) & 0xFF; n += 1; i += factor }
      ResizedMedia(r.doc_id,
        (r.width + factor - 1) / factor, (r.height + factor - 1) / factor,
        n, if (bytes.isEmpty) 0 else bytes(0) & 0xFF, sum)
    }

  /** Emit every `every`-th frame of `frameBytes` bytes (STUB for container
    * demux + frame decode); the last frame may be partial.
    */
  def sampleFramesPartition(rows: Iterator[MediaRow], frameBytes: Int,
      every: Int): Iterator[SampledFrame] =
    rows.flatMap { r =>
      val bytes = r.payload
      Iterator.range(0, bytes.length, frameBytes * every).map { off =>
        val end = math.min(off + frameBytes, bytes.length)
        var sum = 0L
        var i = off
        while (i < end) { sum += bytes(i) & 0xFF; i += 1 }
        SampledFrame(r.doc_id, off / frameBytes, end - off, bytes(off) & 0xFF, sum)
      }
    }

  /** q65: resize the image-typed payloads by 4× (strided byte subsample). */
  def q65Resize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir)
      .filter(col("media_type") === "image")
      .select(col("doc_id"), col("media_type"), col("payload"), col("width"), col("height"))
      .as[MediaRow]
      .mapPartitions(rows => resizePartition(rows, 4))
      .toDF()
      .orderBy(col("doc_id"))
  }

  val q65Sql: String =
    """WITH img AS (
      |  SELECT doc_id, text, strlen(text) AS n,
      |    CAST((doc_id % 64) * 16 + 256 AS INT) AS width,
      |    CAST((doc_id % 36) * 16 + 144 AS INT) AS height
      |  FROM documents WHERE doc_id % 3 = 0)
      |SELECT doc_id,
      |  CAST((width + 3) // 4 AS INT) AS out_width,
      |  CAST((height + 3) // 4 AS INT) AS out_height,
      |  CAST((n + 3) // 4 AS INT) AS out_n_bytes,
      |  ascii(substring(text, 1, 1)) AS first_byte,
      |  CAST(coalesce(list_sum(list_transform(range(1, CAST(n + 1 AS BIGINT), 4),
      |    j -> ascii(substring(text, CAST(j AS INT), 1)))), 0) AS BIGINT) AS byte_sum
      |FROM img ORDER BY doc_id""".stripMargin

  /** q66: sample every 2nd 256-byte frame of the video-typed payloads. */
  def q66FrameSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir)
      .filter(col("media_type") === "video")
      .select(col("doc_id"), col("media_type"), col("payload"), col("width"), col("height"))
      .as[MediaRow]
      .mapPartitions(rows => sampleFramesPartition(rows, 256, 2))
      .toDF()
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  val q66Sql: String =
    """WITH vid AS (
      |  SELECT doc_id, text, strlen(text) AS n
      |  FROM documents WHERE doc_id % 3 = 2),
      |fr AS (
      |  SELECT doc_id, text, n, unnest(range(0, CAST(n AS BIGINT), 512)) AS off
      |  FROM vid)
      |SELECT doc_id,
      |  CAST(off // 256 AS INT) AS frame_idx,
      |  CAST(least(off + 256, n) - off AS INT) AS n_bytes,
      |  ascii(substring(text, CAST(off + 1 AS INT), 1)) AS first_byte,
      |  CAST(coalesce(list_sum(list_transform(range(CAST(off + 1 AS BIGINT), CAST(least(off + 256, n) + 1 AS BIGINT)),
      |    j -> ascii(substring(text, CAST(j AS INT), 1)))), 0) AS BIGINT) AS byte_sum
      |FROM fr ORDER BY doc_id, frame_idx""".stripMargin

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
