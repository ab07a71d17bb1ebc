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

  test("large-star/small-star equals label propagation on every graph shape") {
    val shapes = Map(
      "chain" -> (1L to 200L).sliding(2).map(p => (p(0), p(1))).toSeq,
      "two cliques + bridge-free pair" ->
        ((for (i <- 1L to 6L; j <- (i + 1) to 6L) yield (i, j)) ++
          (for (i <- 10L to 14L; j <- (i + 1) to 14L) yield (i, j)) ++
          Seq((100L, 101L))),
      "random blobs" -> {
        // deterministic pseudo-random pairs over 3 residue classes
        (0 until 300).map { k =>
          val h = k * 2654435761L % 97
          (h * 3 + k % 3, (h + k) % 97 * 3 + k % 3)
        }.filter(p => p._1 != p._2)
      },
      "star" -> (2L to 50L).map(i => (i, 1L)),
      // self-loops: a node whose ONLY edge is (x, x) must still appear,
      // labeled as itself, in both implementations
      "self-loops" -> Seq((5L, 5L), (7L, 8L), (8L, 8L)))
    for ((name, pairs) <- shapes) {
      val edges = pairs.toDF("a", "b")
      val lp = GraphOps.connectedComponents(edges)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val star = GraphOps.connectedComponentsStar(edges)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(star === lp, s"mismatch on $name")
    }
  }

  test("star contraction resolves a long chain in few rounds (diameter-independent)") {
    // a 200-link chain has diameter 200; the contraction must converge
    // well under the 50-iteration cap and label everything with the min.
    // Force the DISTRIBUTED regime: at the default threshold this edge
    // set would take the r16 driver union-find path, and the pin here
    // is the contraction's convergence behavior, not the labels
    TempDirs.zConfLock.synchronized {
      spark.conf.set("spark.graft.cc.driverMaxEdges", "0")
      try {
        val edges = (1L to 200L).sliding(2).map(p => (p(0), p(1))).toSeq.toDF("a", "b")
        val labels = GraphOps.connectedComponentsStar(edges, maxIters = 12)
          .collect().map(r => (r.getLong(0), r.getLong(1)))
        assert(labels.length === 200 && labels.forall(_._2 == 1L))
      } finally spark.conf.unset("spark.graft.cc.driverMaxEdges")
    }
  }

  test("driver union-find regime equals the forced distributed contraction") {
    // the r16 regime pick: both paths must produce the identical
    // (id, component-min) labeling on every shape — including
    // self-loop-only nodes — so the |E| threshold is invisible in
    // results. Default threshold → driver path; conf 0 → distributed.
    val pairs = ((for (i <- 1L to 6L; j <- (i + 1) to 6L) yield (i, j)) ++
      Seq((100L, 101L), (101L, 102L), (5L, 5L), (200L, 200L)) ++
      (1L to 40L).sliding(2).map(p => (p(0) + 300L, p(1) + 300L)).toSeq)
    val edges = pairs.toDF("a", "b")
    val viaDriver = GraphOps.connectedComponentsStar(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val viaCluster = TempDirs.zConfLock.synchronized {
      spark.conf.set("spark.graft.cc.driverMaxEdges", "0")
      try GraphOps.connectedComponentsStar(edges)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      finally spark.conf.unset("spark.graft.cc.driverMaxEdges")
    }
    assert(viaDriver === viaCluster)
    assert(viaDriver.contains((200L, 200L)), "self-loop-only node labels itself")
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
