package graft

import org.apache.spark.sql.SparkSession

/** Bench-only scale measurement for q151's incremental claim: build the
  * maintained sketch table over a copy of a large corpus, then APPEND
  * one small part file and maintain again — the second run must scan
  * only the appended file, and the wall gap is the number the
  * "one scan per file EVER" posture rests on. Usage:
  *   SPARK_GRAFT_SF_DIR=/tmp/sf10 SPARK_GRAFT_APPEND_DIR=/root/testdata/sf0.1 \
  *     runMain graft.MaintainScale
  */
object MaintainScale {
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
    // work on a COPY of the corpus's events dir (appending to the shared
    // replica would contaminate every other measurement run against it)
    val work = java.nio.file.Files.createTempDirectory("graft_maint_scale").toString
    val hconf = spark.sparkContext.hadoopConfiguration
    val src = new org.apache.hadoop.fs.Path(s"$srcDir/events.parquet")
    val dst = new org.apache.hadoop.fs.Path(s"$work/events.parquet")
    org.apache.hadoop.fs.FileUtil.copy(src.getFileSystem(hconf), src,
      dst.getFileSystem(hconf), dst, false, hconf)
    spark.conf.set("spark.graft.kmv.tableDir",
      java.nio.file.Files.createTempDirectory("graft_maint_tbl").toString)

    def timed(label: String): Long = {
      val before = graft.operators.KmvTable.filesScanned.get()
      val t0 = System.nanoTime()
      val n = graft.operators.KmvTable.maintain(spark, work).count()
      val secs = (System.nanoTime() - t0) / 1e9
      val scanned = graft.operators.KmvTable.filesScanned.get() - before
      println(f"""{"metric":"maintain_$label%s","secs":$secs%.1f,""" +
        f""""files_scanned":$scanned,"table_rows":$n}""")
      scanned
    }
    timed("build")
    timed("noop")
    // append one small file (same µs-timestamp physical type as the
    // ScaleUp replica) and maintain again
    graft.streaming.EventsStream.landFeedFile(
      graft.sources.Tables.events(spark, appendDir), s"$work/events.parquet", "append01")
    val scanned = timed("append")
    require(scanned == 1, s"append must scan exactly the new file, scanned $scanned")
    // COMPACTION cost at the same scale: force the threshold so the next
    // append rewrites every live partition into one generation — the
    // claim is that this is table-sized sketch IO, not a corpus pass
    // (files_scanned stays 1: only the appended file touches the feed)
    spark.conf.set("spark.graft.kmv.maxGenerations", "1")
    graft.streaming.EventsStream.landFeedFile(
      graft.sources.Tables.events(spark, appendDir), s"$work/events.parquet", "append02")
    val scanned2 = timed("compact_append")
    require(scanned2 == 1, s"compaction must not rescan the feed, scanned $scanned2")
    spark.stop()
  }
}
