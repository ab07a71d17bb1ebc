package graft

import org.apache.spark.sql.SparkSession

/** Bench-only scale measurement for the z-clustered layout's
  * maintenance claims (the [[graft.operators.ZIndex]] analogue of
  * [[LayoutScale]]): build the layout over a copy of a large corpus's
  * lineitem, then no-op, then APPEND one small delta (the delta must
  * cluster among itself — feed reads bounded by the appended files),
  * then a second append under a generation cap of 2 so the bound-hit
  * GLOBAL RECLUSTER's cost is measured explicitly (for a global sort
  * order the recluster IS the compaction — the OPTIMIZE posture the
  * object doc records; it reads the feed once and should track the
  * build, not the append). Usage:
  *   SPARK_GRAFT_SF_DIR=/tmp/sf10 SPARK_GRAFT_APPEND_DIR=/root/testdata/sf0.1 \
  *     runMain graft.ZScale
  */
object ZScale {
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
    // contaminate other measurements), a fresh layout root
    val work = java.nio.file.Files.createTempDirectory("graft_zscale").toString
    val hconf = spark.sparkContext.hadoopConfiguration
    val src = new org.apache.hadoop.fs.Path(s"$srcDir/lineitem.parquet")
    val dst = new org.apache.hadoop.fs.Path(s"$work/lineitem.parquet")
    org.apache.hadoop.fs.FileUtil.copy(src.getFileSystem(hconf), src,
      dst.getFileSystem(hconf), dst, false, hconf)
    spark.conf.set("spark.graft.zindex.dir",
      java.nio.file.Files.createTempDirectory("graft_zscale_root").toString)

    def timed(label: String): Unit = {
      val b0 = graft.operators.ZIndex.zBuilds.get()
      val a0 = graft.operators.ZIndex.zAppends.get()
      val s0 = graft.operators.ZIndex.zFeedFilesScanned.get()
      val t0 = System.nanoTime()
      graft.operators.ZIndex.ensure(spark, work)
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"""{"metric":"zindex_$label%s","secs":$secs%.1f,""" +
        f""""files_scanned":${graft.operators.ZIndex.zFeedFilesScanned.get() - s0},""" +
        f""""full_builds":${graft.operators.ZIndex.zBuilds.get() - b0},""" +
        f""""appends":${graft.operators.ZIndex.zAppends.get() - a0}}""")
    }
    timed("build")
    timed("noop")
    // one sf0.1-sized delta (1% of the sf10 corpus) as a single file
    graft.sources.Tables.lineitem(spark, appendDir).coalesce(1)
      .write.mode("append").parquet(s"$work/lineitem.parquet")
    timed("append")
    // cap generations at 2: the next delta trips the bound and the
    // maintenance falls back to the global recluster
    spark.conf.set("spark.graft.zindex.maxGenerations", "2")
    graft.sources.Tables.lineitem(spark, appendDir).coalesce(1)
      .write.mode("append").parquet(s"$work/lineitem.parquet")
    timed("recluster")
    spark.stop()
  }
}
