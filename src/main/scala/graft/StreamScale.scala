package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Bench-only streaming-state scale measurement (VERDICT-r7 #5): drive
  * the q64 click→purchase stream-stream join over a corpus at 100× key
  * cardinality on RocksDB state and print ONE JSON line per micro-batch —
  * input rows, batch duration, join-state rows/memory, watermark — so
  * PLANS can record the state-size and throughput curve and show the
  * watermark actually bounds state growth (state plateaus at
  * O(rate × horizon) instead of tracking the stream).
  *
  * The feed lands as `tranches` time-ordered files and the source drains
  * one file per micro-batch: each batch advances the watermark by
  * span/tranches, so eviction is observable BETWEEN batches — landing
  * the whole corpus as one batch would hide it (state peaks once,
  * nothing ever evicts mid-run).
  *
  * Usage: runMain graft.StreamScale <sfDir> <tranches>
  */
object StreamScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val tranches = if (args.length > 1) args(1).toInt else 24
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = java.nio.file.Files.createTempDirectory("graft_stream_scale_").toString
    val (feedDir, ckpt, out) = (s"$base/feed", s"$base/checkpoint", s"$base/out")
    val raw = graft.sources.Tables.eventsRawNanos(spark, sfDir)
      .withColumn("__t", ntile(tranches).over(
        org.apache.spark.sql.expressions.Window.orderBy(col("ts"), col("event_id"))))
    raw.cache()
    val total = raw.count()
    for (i <- 1 to tranches)
      graft.streaming.EventsStream.landFeedFile(
        raw.filter(col("__t") === i).drop("__t"), feedDir, f"tranche$i%03d")
    raw.unpersist()
    System.err.println(s"[streamscale] landed $total rows in $tranches tranches")

    val t0 = System.nanoTime()
    val q = graft.streaming.EventsStream.meteredJoinQuery(
      spark, feedDir, ckpt, out, maxFilesPerTrigger = 1)
    q.awaitTermination()
    val wall = (System.nanoTime() - t0) / 1e9
    def j(s: String): String = "\"" + s.replace("\"", "\\\"") + "\""
    q.recentProgress.foreach { p =>
      val so = p.stateOperators.headOption
      val rocks = so.map(_.customMetrics)
      println(Seq(
        s"${j("batch")}:${p.batchId}",
        s"${j("inputRows")}:${p.numInputRows}",
        s"${j("batchMs")}:${Option(p.durationMs.get("triggerExecution")).getOrElse(-1L)}",
        s"${j("stateRows")}:${so.map(_.numRowsTotal).getOrElse(-1L)}",
        s"${j("stateMemBytes")}:${so.map(_.memoryUsedBytes).getOrElse(-1L)}",
        s"${j("rocksSstBytes")}:${rocks.map(m => Option(m.get("rocksdbSstFileSize")).map(_.longValue).getOrElse(-1L)).getOrElse(-1L)}",
        s"${j("rowsEvicted")}:${so.map(_.numRowsRemoved).getOrElse(-1L)}",
        s"${j("watermark")}:${j(Option(p.eventTime.get("watermark")).getOrElse(""))}"
      ).mkString("{", ",", "}"))
    }
    val joined = spark.read.parquet(out).count()
    println(s"""{"summary":true,"totalRows":$total,"joinedRows":$joined,"wallSec":${"%.1f".format(wall)},"rowsPerSec":${(total / wall).toLong}}""")
    // best-effort cleanup of the multi-GB scratch feed/state
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
    spark.stop()
  }
}
