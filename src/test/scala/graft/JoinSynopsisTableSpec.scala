package graft

import org.apache.spark.sql.functions._

import graft.operators.KmvTable
import graft.plans.JoinSynopsis

/** [[JoinSynopsis.fromTable]] — the feed-free join-synopsis ANALYZE
  * (r11 key tier): per-type [[graft.plans.KeySynopsis]] merged from the
  * maintained table's frequency-KMV bundle, with no corpus scan beyond
  * the maintenance pass. The pin is EQUALITY with [[JoinSynopsis.build]]
  * over the same key population — kept (hash, frequency) pairs
  * included, which is the part plain NDV statistics cannot carry and
  * the part whose mergeability rests on the downward-closure law —
  * plus estimator parity: [[JoinSynopsis.joinEst]] over table-served
  * synopses equals joinEst over feed-built ones, so everything
  * downstream (greedy order, calibrated catalog stats, broadcast
  * decisions) is table-servable.
  */
class JoinSynopsisTableSpec extends SparkSpec {

  private def withTableDir[T](f: String => T): T = {
    val dir = TempDirs.create("graft_jsyn_tbl")
    spark.conf.set("spark.graft.kmv.tableDir", dir)
    try f(dir) finally spark.conf.unset("spark.graft.kmv.tableDir")
  }

  test("fromTable equals a one-pass build over the same key population, per type") {
    withTableDir { _ =>
      val fromT = JoinSynopsis.fromTable(spark, Sf)
      val pop = graft.sources.Tables.events(spark, Sf)
        .filter(col("user_id").isNotNull)
      val types = pop.select(col("event_type")).distinct()
        .collect().map(_.getString(0)).toSet
      assert(fromT.keySet === types)
      val built = types.map(t => t -> JoinSynopsis.build(t,
        pop.filter(col("event_type") === t), col("user_id"), k = 64)).toMap
      types.foreach { t =>
        val (tab, direct) = (fromT(t), built(t))
        assert(tab.rows === direct.rows, s"$t rows")
        assert(tab.kept === direct.kept,
          s"$t kept (hash, frequency) pairs must match exactly")
        assert(tab.keyMin === direct.keyMin && tab.keyMax === direct.keyMax,
          s"$t key bounds")
        assert(tab.distinctEst === direct.distinctEst, s"$t ndv")
      }
      // estimator parity through the consumable path: every type pair
      val ts = types.toSeq.sorted
      for (a <- ts; b <- ts if a < b)
        assert(JoinSynopsis.joinEst(fromT(a), fromT(b)) ===
          JoinSynopsis.joinEst(built(a), built(b)), s"joinEst($a, $b)")
    }
  }

  test("table-served synopsis lands in the catalog where ANALYZE would") {
    // the visible end of the chain: sketch table -> fromTable ->
    // SynopsisStats.injectFromSynopsis -> Spark's catalog statistics.
    // (Planner consumption of injected stats is pinned in
    // SynopsisStatsSpec; here the pin is that the TABLE-served synopsis
    // is a legal, faithful source for that machinery.)
    withTableDir { _ =>
      val (t, syn) = JoinSynopsis.fromTable(spark, Sf).maxBy(_._2.rows)
      spark.sql("DROP TABLE IF EXISTS jsyn_tbl")
      spark.sql("CREATE TABLE jsyn_tbl (user_id BIGINT) USING parquet")
      try {
        graft.plans.SynopsisStats.injectFromSynopsis(
          spark, "jsyn_tbl", syn, "user_id")
        val stats = spark.sessionState.catalog
          .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier("jsyn_tbl"))
          .stats.get
        assert(stats.rowCount === Some(BigInt(syn.rows)), s"rows for $t")
        val cs = stats.colStats("user_id")
        assert(cs.distinctCount ===
          Some(BigInt(math.round(syn.distinctEst))), s"ndv for $t")
        assert(cs.min === syn.keyMin && cs.max === syn.keyMax,
          "Catalyst needs the key bounds or every join estimate zeroes")
      } finally spark.sql("DROP TABLE IF EXISTS jsyn_tbl")
    }
  }

  test("fromTable is feed-free once the table is fresh") {
    withTableDir { _ =>
      KmvTable.maintain(spark, Sf).count()
      val before = KmvTable.filesScanned.get()
      val syn = JoinSynopsis.fromTable(spark, Sf)
      assert(syn.nonEmpty)
      assert(syn.values.forall(s => s.rows > 0 && s.keyMin.isDefined))
      assert(KmvTable.filesScanned.get() === before,
        "fromTable against a fresh table must scan zero feed files")
    }
  }
}
