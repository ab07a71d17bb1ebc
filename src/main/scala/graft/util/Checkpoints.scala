package graft.util

import org.apache.spark.sql.DataFrame

/** Lifecycle helper for eager `localCheckpoint` frames. A checkpoint pins
  * its blocks in the block manager until the session stops; iterative
  * loops and memo caches that mint checkpoints therefore need an explicit
  * release for superseded frames — measured in GraphOps: a second q77 run
  * in one JVM went 8 s → 26 s purely from leaked round states.
  */
object Checkpoints {

  /** Unpersist the cached blocks behind an eager `localCheckpoint` once
    * the frame is superseded. Safe no-op for non-checkpoint plans. Only
    * call when every consumer of the frame has already been materialized
    * (into its own checkpoint, a written file, or a collected result).
    */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false)
      case _ => ()
    }
}
