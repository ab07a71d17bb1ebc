package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

/** The shared part co-occurrence graph memo (q125 + q130) and q130's
  * graph-derived iteration partitioning (optimization r17). */
class PartGraphMemoSpec extends AnyFunSuite {
  private val spark = TestSession.spark
  private val Sf = "/root/testdata/sf0.001"

  test("pagerank iteration frames derive their partition count from " +
      "the graph, floored and capped, not from the session constant") {
    Relational.clearGraph()
    try {
      // sf0.001's adjacency is KB-scale: the derivation floors at 4
      // even though the session runs at shuffle.partitions=4-and-AQE
      val (adjd, degc, _) = Relational.pagerankFrames(spark, Sf)
      assert(adjd.rdd.getNumPartitions === 4,
        "tiny graph must take the floor partition count")
      assert(degc.rdd.getNumPartitions === 4,
        "rank-side frames must share the adjacency partitioning " +
          "(the co-location contract)")
      // force the derivation to be row-driven: at 1 row per partition
      // the same graph derives cap-bounded thousands — prove the knob
      // reads through and the cap holds
      spark.conf.set("spark.graft.pagerank.rowsPerPartition", "1")
      try {
        val (adjd2, _, _) = Relational.pagerankFrames(spark, Sf)
        val n = adjd2.rdd.getNumPartitions
        assert(n > 4 && n <= 4096,
          s"row-driven derivation must scale up with the graph (got $n)")
      } finally spark.conf.unset("spark.graft.pagerank.rowsPerPartition")
    } finally Relational.clearGraph()
  }

  test("the part graph is built once per (session, corpus) and released " +
      "by clearGraph") {
    Relational.clearGraph()
    try {
      val b0 = Relational.graphBuilds.get()
      val (e0, deg) = Relational.prewarmPartGraph(spark, Sf)
      assert(Relational.graphBuilds.get() === b0 + 1)
      val (e0b, degb) = Relational.prewarmPartGraph(spark, Sf)
      assert(Relational.graphBuilds.get() === b0 + 1,
        "a second call must be a memo hit, not a rebuild")
      assert((e0b eq e0) && (degb eq deg),
        "the memo must hand back the same checkpointed frames")
      def rddOf(df: org.apache.spark.sql.DataFrame) =
        df.queryExecution.analyzed
          .asInstanceOf[org.apache.spark.sql.execution.LogicalRDD].rdd
      assert(rddOf(e0).getStorageLevel.useMemory ||
        rddOf(e0).getStorageLevel.useDisk, "edges checkpoint persisted")
      Relational.clearGraph()
      assert(rddOf(e0).getStorageLevel ===
        org.apache.spark.storage.StorageLevel.NONE,
        "clearGraph must unpersist the edge checkpoint")
      assert(rddOf(deg).getStorageLevel ===
        org.apache.spark.storage.StorageLevel.NONE,
        "clearGraph must unpersist the degree checkpoint")
    } finally Relational.clearGraph()
  }
}
