package graft

import org.apache.spark.sql.functions._

import graft.plans.{JoinSynopsis, SynopsisStats}
import graft.streaming.EventsStream

/** q173 — the statistics catalog planning a STREAMING join: the q92
  * stream-static enrich with no broadcast hint, the dim a catalog
  * table carrying injected synopsis statistics. Pins on the
  * micro-batch executed plan (the streaming analogue of the batch
  * executed-plan pins):
  *
  *   1. honest statistics → every micro-batch plans a
  *      BroadcastHashJoin with the DIM on the build side (BuildRight —
  *      the dim is the right join child and streaming has no reorder),
  *      no sort-merge exchange anywhere;
  *   2. INFLATED statistics (same code, stats perturbed through the
  *      public inject surface, memo deliberately NOT cleared so the
  *      perturbation stands) → the dim is never the build side again.
  *      At fixture scale the planner broadcasts the tiny stream batch
  *      instead (BuildLeft); at production scale, where the stream
  *      side dwarfs any threshold, the same refusal means a per-batch
  *      shuffle join — either way the broadcast decision provably
  *      rides the catalog, not a hint or a file-size accident;
  *   3. clearing the memo re-lands honest statistics and restores the
  *      dim-side broadcast (the WeatherStatsSpec restore discipline);
  *   4. results are identical across all three plans and equal the
  *      hinted q92 result — the plan's provenance changed, not the
  *      answer.
  */
class StreamStatsEnrichSpec extends SparkSpec {

  test("q173: hint-free stream enrich broadcasts off injected catalog " +
      "stats; inflated stats degrade it to a shuffle join; restore " +
      "re-broadcasts; results identical throughout and equal to q92") {
    EventsStream.clearDimMemo()
    val tbl = EventsStream.custDimTable(Sf)
    try {
      val r1 = EventsStream.runStreamStatsEnrichOnce(spark, Sf, "sse_t1")
        .orderBy(col("window_start"), col("c_mktsegment")).collect().toSeq
      val plan1 = EventsStream.lastEnrichPlan.get()
      assert(r1.nonEmpty)
      // the dim is the RIGHT join child (events.join(dim)), so a
      // dim-side broadcast reads BuildRight in the micro-batch plan
      def dimIsBuildSide(p: String): Boolean =
        p.contains("BroadcastHashJoin") && p.contains("BuildRight")
      assert(dimIsBuildSide(plan1) && !plan1.contains("SortMergeJoin"),
        s"honest dim statistics must broadcast the dim side of the " +
          s"hint-free join:\n$plan1")
      assert(plan1.contains(tbl),
        s"the micro-batch plan must scan the catalog dim table:\n$plan1")

      // inflate: 50M rows × 1 KB through the same public surface; the
      // memo is NOT cleared, so the next run's registration memo-hits
      // and the perturbation stands
      SynopsisStats.inject(spark, tbl, 50000000L, Map.empty,
        avgRowBytes = 1024)
      spark.catalog.refreshTable(tbl)
      val r2 = EventsStream.runStreamStatsEnrichOnce(spark, Sf, "sse_t2")
        .orderBy(col("window_start"), col("c_mktsegment")).collect().toSeq
      val plan2 = EventsStream.lastEnrichPlan.get()
      assert(!dimIsBuildSide(plan2),
        s"an inflated dim must never be the build side:\n$plan2")
      assert(r2 === r1, "the join strategy must not change the result")

      // restore: clearing the memo forces honest re-injection
      EventsStream.clearDimMemo()
      val r3 = EventsStream.runStreamStatsEnrichOnce(spark, Sf, "sse_t3")
        .orderBy(col("window_start"), col("c_mktsegment")).collect().toSeq
      val plan3 = EventsStream.lastEnrichPlan.get()
      assert(dimIsBuildSide(plan3),
        s"honest re-injection must restore the dim-side broadcast:\n$plan3")
      assert(r3 === r1)

      // same answer as the HINTED q92 path over the same corpus
      val q92 = EventsStream.runStreamEnrichOnce(spark, Sf, "sse_q92")
        .orderBy(col("window_start"), col("c_mktsegment")).collect().toSeq
      assert(r1 === q92, "q173 must compute exactly q92's enrich")
    } finally {
      EventsStream.clearDimMemo()
      // leave honest stats behind for any later suite touching the dim
      if (spark.catalog.tableExists(tbl)) {
        val syn = JoinSynopsis.build(tbl, spark.table(tbl), col("c_custkey"))
        SynopsisStats.inject(spark, tbl, syn.rows,
          Map("c_custkey" -> syn), avgRowBytes = 32)
        spark.catalog.refreshTable(tbl)
      }
    }
  }
}
