package graft

import org.apache.spark.sql.SparkSession

/** Bench-only state-scale measurement for q150 (streaming KMV): run the
  * windowed sketch aggregation over a corpus and print the final
  * streaming-state footprint. The claim under test: state is
  * groups × O(k) — the same corpus at 100× user cardinality (sf10
  * replica: same days/types, 100× distinct users) must show the SAME
  * state row count and the same per-group state bytes, where an exact
  * distinct-count formulation (if streaming allowed one) would hold
  * every distinct user in state. Companion to `graft.StreamScale`
  * (q64's join-state plateau). Usage:
  *   SPARK_GRAFT_SF_DIR=<dir> runMain graft.SketchStateScale
  */
object SketchStateScale {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val q = graft.streaming.EventsStream
      .kmvWindowAgg(spark, graft.streaming.EventsStream.readEvents(spark, sfDir))
      .writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete)
      .format("memory").queryName("sketch_state_scale")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val secs = (System.nanoTime() - t0) / 1e9
    val groups = spark.table("sketch_state_scale").count()
    val so = q.recentProgress.flatMap(_.stateOperators.headOption)
    val rows = if (so.nonEmpty) so.map(_.numRowsTotal).max else -1L
    val bytes = if (so.nonEmpty) so.map(_.memoryUsedBytes).max else -1L
    val distinct = spark.table("sketch_state_scale")
      .sparkSession.read.parquet(s"$sfDir/events.parquet") // raw: cardinality context
      .selectExpr("approx_count_distinct(user_id) AS n").collect()(0).getLong(0)
    println(f"""{"metric":"sketch_state","state_rows":$rows,""" +
      f""""state_bytes":$bytes,"groups":$groups,""" +
      f""""bytes_per_group":${if (rows > 0) bytes / rows else -1},""" +
      f""""approx_distinct_users":$distinct,"secs":$secs%.1f,"sf":"$sfDir"}""")
    spark.stop()
  }
}
