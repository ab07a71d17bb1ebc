package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import scala.collection.mutable
object ProbeFunnel {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.util.Checkpoints.arm()
    val dir = "/tmp/sf10"
    import graft.operators.TextOps
    TextOps.prewarmSharedArtifacts(spark, dir)
    TextOps.q145CurationFunnel(spark, dir).collect() // warm (memo + jit)
    graft.util.Harness.sweep(spark)
    val stages = mutable.ArrayBuffer[(Int, String, Long, Long)]()
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        stages += ((si.stageId, si.name.take(80),
          si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L),
          si.taskMetrics.executorRunTime))
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    TextOps.q145CurationFunnel(spark, dir).collect()
    println(f"[probe] warm q145: ${(System.nanoTime()-t0)/1e9}%.1f s")
    spark.sparkContext.removeSparkListener(listener)
    Thread.sleep(1000)
    stages.sortBy(-_._3).take(14).foreach { case (id, name, wall, run) =>
      println(f"[stage] $id%4d wall=${wall/1000.0}%7.1f s run=${run/1000.0}%8.1f s  $name")
    }
    spark.stop()
  }
}
