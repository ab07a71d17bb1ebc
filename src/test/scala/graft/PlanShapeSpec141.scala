package graft

import graft.operators.TextOps
import graft.multimodal.MultimodalOps

/** Plan pins for the round-8 dedup additions (same convention as
  * PlanShapeSpec: AQE off, executed plan inspected as text).
  *
  * q141: the scale claim is "gram TEXT never ships" — every shuffle and
  * broadcast reads the cached (doc_id, pos, h) frame, h being the
  * 16-hex-char hash computed row-local; the flag probe is a semi join
  * (dup set on the build side); span merge rides one doc_id exchange.
  *
  * q140: the claim is "the hash is map-only" — the cached fingerprint
  * frame holds exactly the four 16-bit bands (payload bytes never pass
  * an exchange), and candidate generation joins on (media_type, band
  * index, band value), never all pairs.
  */
class PlanShapeSpec141 extends SparkSpec {

  /** Distinct Exchange INSTANCES for `pat` — a cached subtree prints once
    * per scan site, so raw matches double-count (same helper as
    * PlanShapeSpec).
    */
  private def distinctExchanges(plan: String, pat: String): Int =
    (pat + "[^\\[]*\\[plan_id=(\\d+)").r.findAllMatchIn(plan).map(_.group(1)).toSet.size

  private def withStaticPlan[T](f: => T): T = {
    val saved = spark.conf.get("spark.sql.adaptive.enabled", "true")
    try { spark.conf.set("spark.sql.adaptive.enabled", "false"); f }
    finally spark.conf.set("spark.sql.adaptive.enabled", saved)
  }

  test("q141 ships gram hashes, not gram text; flag probe is a semi join on h") {
    withStaticPlan {
      // fresh-cache rule (same as the q138/q139 pins): a prior suite's
      // cached gram frame splices its ORIGINAL subtree — built under AQE,
      // with unknown output partitioning — into this plan, forcing the
      // window to re-shuffle and skewing the exchange count
      spark.sharedState.cacheManager.clearCache()
      val q = TextOps.q141SubstringDedup(spark, Sf)
      q.collect()
      val plan = q.queryExecution.executedPlan.toString
      // the cached gram frame is exactly (doc_id, pos, h)
      assert("InMemoryTableScan \\[doc_id#\\d+L, pos#\\d+, h#\\d+\\]".r
        .findFirstIn(plan).isDefined, s"3-column gram cache missing in:\n$plan")
      // no token array or raw text survives into any cached/shuffled frame
      assert(!plan.contains("toks#") && "InMemoryTableScan \\[[^\\]]*text#".r.findFirstIn(plan).isEmpty,
        s"gram text leaked past the row-local hash in:\n$plan")
      assert(plan.contains("LeftSemi"), s"flag probe should be a semi join in:\n$plan")
      // ONE doc_id exchange total: the upfront parallelism repartition,
      // whose partitioning the cache keeps and both island windows REUSE
      // (a second instance would mean the window re-shuffles)
      assert(distinctExchanges(plan, "Exchange hashpartitioning\\(doc_id#\\d+L") === 1,
        s"expected the windows to reuse the cached doc_id partitioning in:\n$plan")
    }
  }

  test("q140 caches only band columns; candidates join on (media_type, band, value)") {
    withStaticPlan {
      spark.sharedState.cacheManager.clearCache() // same fresh-cache rule
      val q = MultimodalOps.q140PhashNearDup(spark, Sf)
      q.collect()
      val plan = q.queryExecution.executedPlan.toString
      // the fingerprint cache: doc_id, media_type and the four bands only
      assert(("InMemoryTableScan \\[doc_id#\\d+L, media_type#\\d+, " +
        "h0#\\d+, h1#\\d+, h2#\\d+, h3#\\d+\\]").r.findFirstIn(plan).isDefined,
        s"band-only fingerprint cache missing in:\n$plan")
      // payload bytes never appear in any cached or exchanged frame
      assert("InMemoryTableScan \\[[^\\]]*payload".r.findFirstIn(plan).isEmpty &&
        "Exchange [^\\n]*payload".r.findFirstIn(plan).isEmpty,
        s"payload leaked past the map-side hash in:\n$plan")
      // LSH banding: the pair join keys are (media_type, j, h), with the
      // doc_id ordering as a residual condition — never a cross product
      assert("Join \\[media_type#\\d+, j#\\d+, h#\\d+\\]".r.findFirstIn(plan).isDefined,
        s"banded candidate join missing in:\n$plan")
      assert(!plan.contains("CartesianProduct"), s"all-pairs fallback in:\n$plan")
    }
  }
}
