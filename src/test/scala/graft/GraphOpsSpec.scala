package graft

import graft.operators.GraphOps

class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  test("chains collapse transitively; disjoint pairs stay separate") {
    // components: {1,2,3,4} (chain), {10,11}, {20,21,22} (star on 21)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (21L, 20L), (21L, 22L))
      .toDF("a", "b")
    val got = GraphOps.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("label propagation is orientation-independent") {
    val e1 = Seq((5L, 6L), (7L, 6L)).toDF("a", "b")
    val e2 = Seq((6L, 5L), (6L, 7L)).toDF("a", "b")
    val l1 = GraphOps.connectedComponents(e1).collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val l2 = GraphOps.connectedComponents(e2).collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(l1.toSeq === l2.toSeq)
    assert(l1.forall(_._2 == 5L))
  }
}
