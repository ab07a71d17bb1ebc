package graft

import graft.operators.Relational

/** q125's two execution regimes must agree exactly: the broadcast branch
  * (gate scale) and the bloom-pruned shuffle branch (the >20M-edge scale
  * path, forced here by dropping the threshold to 0). The Bloom sketch
  * admits false positives only — the exact closing join re-verifies — so
  * the triangle count is provably identical, and this spec pins it.
  */
class TriangleRegimeSpec extends SparkSpec {

  test("bloom-pruned shuffle branch equals broadcast branch exactly") {
    val bcast = Relational.queries("q125_triangles")(spark, Sf).collect().toSeq
    spark.conf.set("spark.graft.triangles.broadcastMaxEdges", "0")
    try {
      val shuffled = Relational.queries("q125_triangles")(spark, Sf).collect().toSeq
      assert(shuffled === bcast)
    } finally spark.conf.unset("spark.graft.triangles.broadcastMaxEdges")
  }
}
