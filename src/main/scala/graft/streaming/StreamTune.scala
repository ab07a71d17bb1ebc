package graft.streaming

import org.apache.spark.sql.SparkSession

/** Scale-adaptive partitioning for the STREAMING lane (optimization
  * guide §2.2/§2.4 applied to state stores): structured streaming
  * cannot ride AQE's partition coalescing — every stateful operator
  * (windowed agg, stream-stream join, dropDuplicates) materializes one
  * state-store instance per shuffle partition and pays a fixed
  * per-partition, per-micro-batch protocol cost (store open, version
  * load, delta commit, maintenance snapshot), and a stream-stream join
  * keeps FOUR stores per partition. With the session default tracking
  * the core count (32 locally), a KB-scale gate stream pays 32-128
  * store commits per batch to shuffle a few MB: measured at sf0.1 on
  * this box, q94 22.4 s → 8.3 s at 8 partitions → 7.5 s at 4, and the
  * windowed-agg family halves (q87 8.7 → 3.5, q153 6.8 → 2.3, A/B/A
  * controlled; OPTIMIZATION_r16.md has the table).
  *
  * So the streaming harnesses size their shuffle/state partitioning
  * from the SOURCE BYTES, not the core count — the same
  * input-derived rule a batch plan gets from AQE. Production knobs:
  *
  *  - `spark.graft.stream.bytesPerPartition` (default 8 MB of source
  *    input per partition — state is a fraction of input for every
  *    operator here, so input bytes are the available upper proxy);
  *  - `spark.graft.stream.minPartitions` (default 4 — a floor so a
  *    small gate still overlaps store commits and per-batch compute);
  *  - `spark.graft.stream.maxPartitions` (default 4096 — a cap so a
  *    pathological listing cannot plan millions of stores; clusters
  *    running genuinely large streams raise it).
  *
  * At 100 TB/day the same rule yields thousands of partitions — the
  * knob scales with data, which is exactly what a constant tuned to
  * either local[32] or one cluster would not do.
  */
object StreamTune {

  private def confLong(spark: SparkSession, key: String, dflt: Long): Long =
    spark.conf.getOption(key).flatMap(_.trim.toLongOption).getOrElse(dflt)

  /** Total bytes under each path (file or directory), via the path's
    * own FileSystem — KB-scale driver metadata, never a data scan. */
  private def bytesOf(spark: SparkSession, paths: Seq[String]): Long = {
    val hconf = spark.sessionState.newHadoopConf()
    paths.map { p =>
      val path = new org.apache.hadoop.fs.Path(p)
      val fs = path.getFileSystem(hconf)
      if (fs.exists(path)) fs.getContentSummary(path).getLength else 0L
    }.sum
  }

  /** The input-derived partition count for a stream whose source files
    * live under `paths`. */
  def statePartitions(spark: SparkSession, paths: Seq[String]): Int = {
    val perPart = math.max(1L,
      confLong(spark, "spark.graft.stream.bytesPerPartition", 8L << 20))
    val floor = confLong(spark, "spark.graft.stream.minPartitions", 4L)
    val cap = confLong(spark, "spark.graft.stream.maxPartitions", 4096L)
    val derived = (bytesOf(spark, paths) + perPart - 1) / perPart
    math.max(floor, math.min(cap, math.max(1L, derived))).toInt
  }

  /** Run `body` (build + start + drain one finite streaming query)
    * with `spark.sql.shuffle.partitions` set to the input-derived
    * count, restoring the prior value after. The window is session-
    * wide by necessity (a stream reads the conf at planning); every
    * caller in this repo drains its query synchronously inside the
    * window, and each suite/harness owns its session, so no concurrent
    * query can observe the narrowed value. Checkpointed queries record
    * the count in their offsets log at first start and keep it across
    * restarts — the tranche harnesses reuse one checkpoint per
    * invocation, so all their runs agree by construction. */
  def withStatePartitions[T](spark: SparkSession, paths: Seq[String])(
      body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prior = spark.conf.getOption(key)
    val derived = statePartitions(spark, paths).toString
    // no-op when the session already sits at the derived value (the
    // test suites share one session across parallel suites at the
    // floor — an unchanged value must not even open a restore window)
    if (prior.contains(derived)) return body
    spark.conf.set(key, derived)
    try body
    finally prior match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
