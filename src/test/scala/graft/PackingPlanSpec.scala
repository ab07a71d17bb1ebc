package graft

import graft.operators.TextOps

/** Pins q95's scale claim on the LIVE plan: packing is a window
  * partitioned by source, so the exchange is a hash partitioning on
  * source and no stage collapses to a single partition — the failure
  * mode of a naive global pack (one world-wide sort) that PLANS §r5
  * promises this operator avoids.
  */
class PackingPlanSpec extends SparkSpec {

  test("sequence packing partitions by source — no single-partition stage") {
    val df = TextOps.q95SequencePacking(spark, Sf)
    df.collect() // let AQE settle so the FINAL plan is inspected
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(source"),
      s"expected a source-partitioned exchange in:\n$plan")
    // the output orderBy is the only legitimate global ordering; the
    // window itself must not run on a single partition
    val windowed = plan.linesIterator.filter(_.contains("Window")).mkString("\n")
    assert(!windowed.contains("SinglePartition"),
      s"window collapsed to a single partition:\n$plan")
  }
}
