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
