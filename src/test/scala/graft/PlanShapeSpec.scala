package graft

import graft.operators.{Layout, TextOps}

/** Executable versions of the PLANS.md shape claims for the newest
  * operators: the claims "map-only" and "nothing funnels through one
  * task" are plan properties, so pin them as plan assertions rather than
  * prose (AQE off so the executed plan is statically inspectable — the
  * same convention as DppSpec).
  */
class PlanShapeSpec extends SparkSpec {

  private def withStaticPlan[T](f: => T): T = {
    val saved = spark.conf.get("spark.sql.adaptive.enabled", "true")
    try { spark.conf.set("spark.sql.adaptive.enabled", "false"); f }
    finally spark.conf.set("spark.sql.adaptive.enabled", saved)
  }

  test("q110 chunking is map-only up to the presentation sort") {
    withStaticPlan {
      val q = TextOps.q110Chunking(spark, Sf)
      q.collect()
      val plan = q.queryExecution.executedPlan.toString
      val exchanges = "Exchange".r.findAllIn(plan).size
      assert(exchanges === 1, s"expected only the final sort's exchange in:\n$plan")
      assert(plan.contains("rangepartitioning"),
        s"the one exchange should be the presentation sort's range partitioning:\n$plan")
    }
  }

  test("q113's only single-partition stage is the bucket-count cumsum") {
    withStaticPlan {
      val q = Layout.q113DenseIds(spark, Sf)
      q.collect()
      val plan = q.queryExecution.executedPlan.toString
      val singles = "SinglePartition".r.findAllIn(plan).size
      assert(singles === 1,
        s"exactly one SinglePartition exchange (the tiny offsets branch) expected in:\n$plan")
      // the fat-table window shuffles by the bucket, not into one task
      assert(plan.contains("hashpartitioning(__b"),
        s"per-bucket window partitioning missing in:\n$plan")
    }
  }
}
