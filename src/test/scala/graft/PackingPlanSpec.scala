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
    // no stage may collapse to one partition. Spark prints the collapse
    // on the EXCHANGE line ('Exchange SinglePartition'), not the Window
    // line, so assert over the whole plan; the terminal orderBy plans as
    // rangepartitioning, so a passing plan has no SinglePartition at all
    assert(!plan.contains("Exchange SinglePartition"),
      s"a stage collapsed to a single partition:\n$plan")
  }
}
