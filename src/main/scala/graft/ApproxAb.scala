package graft

import org.apache.spark.sql.SparkSession

/** Bench-only A/B for [[graft.plans.ApproxDistinctRewrite]]: the SAME
  * COUNT(DISTINCT) SQL timed exact and under approximate mode, so the
  * conf switch's cost/accuracy trade is a measured number (PLANS §r9)
  * rather than an argument. Usage:
  *   SPARK_GRAFT_SF_DIR=<dir> [SPARK_GRAFT_REPS=5] runMain graft.ApproxAb
  */
object ApproxAb {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ graft.plans.ApproxDistinctRewrite
    graft.sources.Tables.events(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("user_id").isNotNull)
      .createOrReplaceTempView("ab_events")
    val sql = """SELECT event_type, CAST(ts AS DATE) AS d,
                 count(DISTINCT user_id) AS n
                 FROM ab_events GROUP BY 1, 2"""
    // min over reps, not the last rep: the recorded A/B number must be
    // the steady-state cost, not whichever rep a GC/compile outlier hit
    // (per-rep values stay on stderr for the distribution)
    def run(label: String): Double = {
      var best = Double.MaxValue
      for (_ <- 1 to reps) {
        val t0 = System.nanoTime()
        val n = spark.sql(sql).collect().length
        val sec = (System.nanoTime() - t0) / 1e9
        best = math.min(best, sec)
        System.err.println(f"[ab] $label%s $sec%.1f s ($n groups)")
      }
      best
    }
    val exact = run("exact")
    spark.conf.set("spark.graft.approx.countDistinct", "true")
    val approx = run("approx")
    println(f"""{"metric":"approx_ab","exact_sec":$exact%.1f,""" +
      f""""approx_sec":$approx%.1f,"speedup":${exact / approx}%.1f,"sf":"$sfDir"}""")
    spark.stop()
  }
}
