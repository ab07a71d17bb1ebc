package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Bench-only state-scale measurement for the STATISTICS streaming
  * aggregates (r11 verdict #5): q167's frequency-KMV and q160's
  * quantile sketch driven at scaled GROUP cardinality on RocksDB. The
  * claim under test — streaming state is exactly ONE bounded O(k) row
  * per (window, type) group — is measured, not fixture-pinned: a
  * `fanout`-suffixed corpus multiplies the group count (every replica
  * gets its own event_type names, so windows × types grows fanout×,
  * and input rows grow fanout× with them), and the run must show
  * state rows == groups at every fanout while an exact formulation
  * would hold every distinct (group, user) / (group, row) in state.
  * Complete output mode keeps every group IN state (no watermark
  * eviction — the adversarial ceiling; production Append mode evicts
  * closed windows and only shrinks it); the sink is noop so the
  * 100×-group run measures the STATE store, not a driver
  * materialization. Companions: `graft.StreamScale` (q64's join-state
  * plateau), `graft.SketchStateScale` (q150's KMV).
  *
  * A third arg selects the output mode: `complete` (default — the
  * no-eviction ceiling) or `append` (production: the 168 h watermark
  * evicts closed windows on emission, so the REPORTED final state is
  * the open-window plateau, not the group total — the q64 StreamScale
  * claim for the statistics aggregates).
  *
  * Usage:
  *   SPARK_GRAFT_SF_DIR=<dir> runMain graft.StatsStateScale <kmvfreq|quantile> [fanout] [complete|append]
  */
object StatsStateScale {
  def main(args: Array[String]): Unit = {
    val agg = args(0)
    val fanout = if (args.length > 1) args(1).toInt else 1
    val mode = if (args.length > 2) args(2) else "complete"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    // group-cardinality fanout: type-suffixed replicas — fanout× the
    // (window, type) groups AND fanout× the rows; user/value
    // distributions per group unchanged. event_id offset keeps row
    // identities (the quantile sample's hash domain) distinct across
    // replicas, as in ScaleUp.
    val id8 = java.security.MessageDigest.getInstance("MD5")
      .digest(sfDir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
    val feed =
      if (fanout == 1) sfDir
      else {
        val out = s"${sys.props("java.io.tmpdir")}/graft_stats_state/${id8}_f$fanout"
        // replica reuse is stamped on the SOURCE feed's file identity —
        // a regenerated corpus at the same path must not be measured
        // through a stale fanout copy
        val stamp = graft.operators.KmvTable.feedStamp(spark, sfDir)
        val stampFile = new java.io.File(s"$out/_stamp")
        val fresh = new java.io.File(s"$out/events.parquet/_SUCCESS").exists &&
          stampFile.exists &&
          new String(java.nio.file.Files.readAllBytes(stampFile.toPath),
            "UTF-8") == stamp
        if (!fresh) {
          spark.read.parquet(s"$sfDir/events.parquet")
            .crossJoin(broadcast(spark.range(fanout).toDF("__r")))
            .withColumn("event_type",
              concat(col("event_type"), lit("_"), col("__r")))
            .withColumn("event_id", col("event_id") + col("__r") * 10000000L)
            .drop("__r")
            .write.mode("overwrite").parquet(s"$out/events.parquet")
          java.nio.file.Files.write(stampFile.toPath, stamp.getBytes("UTF-8"))
        }
        out
      }

    val events = graft.streaming.EventsStream.readEvents(spark, feed)
    val streamed = agg match {
      case "kmvfreq" => graft.streaming.EventsStream.kmvFreqWindowAgg(spark, events)
      case "quantile" => graft.streaming.EventsStream.quantileWindowAgg(spark, events)
      case other => sys.error(s"unknown aggregate: $other")
    }
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_stats_state_ckpt_").toString
    val outMode =
      if (mode == "append") org.apache.spark.sql.streaming.OutputMode.Append
      else org.apache.spark.sql.streaming.OutputMode.Complete
    val t0 = System.nanoTime()
    val q = streamed.writeStream
      .outputMode(outMode)
      .format("noop").option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val secs = (System.nanoTime() - t0) / 1e9
    val progress = q.recentProgress
    val so = progress.flatMap(_.stateOperators.headOption)
    // peak = the run's high-water mark; final = after the last batch's
    // watermark evictions (append mode's plateau; == peak in complete)
    val stateRows = if (so.nonEmpty) so.map(_.numRowsTotal).max else -1L
    val finalRows = if (so.nonEmpty) so.last.numRowsTotal else -1L
    val stateBytes = if (so.nonEmpty) so.map(_.memoryUsedBytes).max else -1L
    val inputRows = progress.map(_.numInputRows).sum
    // expected group count, batch-side (same population rule per agg)
    val raw = graft.sources.Tables.events(spark, feed)
    val pop = agg match {
      case "kmvfreq" => raw.filter(col("user_id").isNotNull)
      case _ => raw.filter(col("value").isNotNull && col("event_id").isNotNull)
    }
    val groups = pop
      .select(date_trunc("hour", col("ts")).as("w"), col("event_type"))
      .distinct().count()
    println(f"""{"metric":"stats_state","agg":"$agg","fanout":$fanout,""" +
      f""""mode":"$mode","final_rows":$finalRows,""" +
      f""""state_rows":$stateRows,"groups":$groups,"state_bytes":$stateBytes,""" +
      f""""bytes_per_group":${if (stateRows > 0) stateBytes / stateRows else -1},""" +
      f""""input_rows":$inputRows,"rows_per_sec":${(inputRows / secs).toLong},""" +
      f""""secs":$secs%.1f,"sf":"$sfDir"}""")
    spark.stop()
  }
}
