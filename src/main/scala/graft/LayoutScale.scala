package graft

import org.apache.spark.sql.SparkSession

/** Bench-only scale measurement for the typed layout's incremental
  * claim (the [[graft.operators.StatsJoin]] analogue of
  * [[MaintainScale]]): build the layout over a copy of a large corpus,
  * then APPEND one small part file and register again — the second
  * run must read only the appended file and rewrite only the touched
  * (type, day) partitions; the wall gap is the number the
  * O(touched)-per-append posture rests on. Usage:
  *   SPARK_GRAFT_SF_DIR=/tmp/sf10 SPARK_GRAFT_APPEND_DIR=/root/testdata/sf0.1 \
  *     runMain graft.LayoutScale
  */
object LayoutScale {
  def main(args: Array[String]): Unit = {
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf10")
    val appendDir = sys.env.getOrElse("SPARK_GRAFT_APPEND_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // a COPY of the corpus (appending to the shared replica would
    // contaminate other measurements against it), a fresh layout root
    val work = java.nio.file.Files.createTempDirectory("graft_layout_scale").toString
    val hconf = spark.sparkContext.hadoopConfiguration
    val src = new org.apache.hadoop.fs.Path(s"$srcDir/events.parquet")
    val dst = new org.apache.hadoop.fs.Path(s"$work/events.parquet")
    org.apache.hadoop.fs.FileUtil.copy(src.getFileSystem(hconf), src,
      dst.getFileSystem(hconf), dst, false, hconf)
    spark.conf.set("spark.graft.evlayout.dir",
      java.nio.file.Files.createTempDirectory("graft_layout_scale_root").toString)

    def timed(label: String): Unit = {
      val b0 = graft.operators.StatsJoin.layoutBuilds.get()
      val s0 = graft.operators.StatsJoin.layoutFilesScanned.get()
      val t0 = System.nanoTime()
      val tbls = graft.operators.StatsJoin.registerTypedTables(spark, work)
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"""{"metric":"layout_$label%s","secs":$secs%.1f,""" +
        f""""files_scanned":${graft.operators.StatsJoin.layoutFilesScanned.get() - s0},""" +
        f""""full_builds":${graft.operators.StatsJoin.layoutBuilds.get() - b0},""" +
        f""""types":${tbls.size}}""")
    }
    timed("build")
    timed("noop")
    graft.streaming.EventsStream.landFeedFile(
      graft.sources.Tables.events(spark, appendDir),
      s"$work/events.parquet", "append01")
    timed("append")
    // COMPACTION cost must track the COMPACTED SUBSET, not the table
    // (r12 verdict #4): land two single-(type, day) appends, then cap
    // generations at 2 — the third small append retires the
    // fewest-partition generation (one day of one type), while the
    // bulk generations ride by reference. compact ≈ append_small,
    // both orders of magnitude under build.
    import org.apache.spark.sql.functions._
    def smallAppend(day: String, name: String): Unit =
      graft.streaming.EventsStream.landFeedFile(
        graft.sources.Tables.events(spark, appendDir)
          .filter(col("event_type") === "view" &&
            to_date(col("ts")) === lit(day).cast("date")),
        s"$work/events.parquet", name)
    smallAppend("2024-01-03", "append02")
    timed("append_small")
    spark.conf.set("spark.graft.layout.maxGenerations", "2")
    smallAppend("2024-01-04", "append03")
    timed("compact")
    spark.stop()
  }
}
