package graft

import org.apache.spark.sql.SparkSession

/** Streaming-lane plan-shape evidence (optimization r16): a streaming
  * query's executed plan cannot be captured through Dataset.explain —
  * the declared entries run their query to completion internally — so
  * the auditable record of WHAT PARTITIONING a stream planned with is
  * the engine's own progress telemetry: each micro-batch's
  * state-operator rows (operator name, numShufflePartitions — the
  * state-store instance count per operator — and state rows).
  *
  * Usage: runMain graft.ExplainStream <query> [query ...] [k=v ...]
  *
  * Conf overrides ride as k=v args; in particular
  * `spark.graft.stream.minPartitions=32` floors StreamTune's derived
  * partitioning back at the pre-r16 core-count value, which is how the
  * committed `plans/r16/streaming_state_partitions_before.txt` was
  * produced (the `_after` capture runs with defaults).
  */
object ExplainStream {
  def main(args: Array[String]): Unit = {
    val (confs, queries) = args.toSeq.partition(_.contains("="))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    confs.foreach { kv =>
      val Array(k, v) = kv.split("=", 2); b.config(k, v)
    }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.util.Checkpoints.arm()
    spark.streams.addListener(
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        import org.apache.spark.sql.streaming.StreamingQueryListener._
        override def onQueryStarted(e: QueryStartedEvent): Unit = ()
        override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
        override def onQueryProgress(e: QueryProgressEvent): Unit = {
          val p = e.progress
          val ops = p.stateOperators
          if (ops.isEmpty)
            println(s"[stream-evidence] query=${p.name} batch=${p.batchId} " +
              "stateless")
          else ops.foreach { op =>
            println(s"[stream-evidence] query=${p.name} batch=${p.batchId} " +
              s"op=${op.operatorName} shufflePartitions=" +
              s"${op.numShufflePartitions} stateRows=${op.numRowsTotal}")
          }
        }
      })
    queries.foreach { q =>
      println(s"========== $q ==========")
      val n = SparkEntry.queries(q)(spark, sfDir).count()
      println(s"[stream-evidence] $q result_rows=$n")
    }
    spark.stop()
  }
}
