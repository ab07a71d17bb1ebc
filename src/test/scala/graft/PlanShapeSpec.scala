package graft

import graft.operators.{Layout, Relational, TextOps}

/** Executable versions of the PLANS.md shape claims for the newest
  * operators: the claims "map-only" and "nothing funnels through one
  * task" are plan properties, so pin them as plan assertions rather than
  * prose (AQE off so the executed plan is statically inspectable — the
  * same convention as DppSpec).
  */
class PlanShapeSpec extends SparkSpec {

  /** Count distinct Exchange INSTANCES matching `pat`: a cached frame's
    * subtree prints once per scan site, so raw pattern counts
    * double-count — the plan_id disambiguates (same exchange, same id).
    */
  private def distinctExchanges(plan: String, pat: String): Int =
    (pat + "[^\\[]*\\[plan_id=(\\d+)").r.findAllMatchIn(plan).map(_.group(1)).toSet.size

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

  test("q119 sessionization rides ONE exchange on user_id") {
    withStaticPlan {
      val q = Relational.q119Sessionization(spark, Sf)
      q.collect()
      val plan = q.queryExecution.executedPlan.toString
      // both window passes AND the (user, session) aggregate must reuse the
      // user_id partitioning: a hashpartitioning(user_id, session_id)
      // exchange would mean the superset-clustering reuse regressed
      assert("hashpartitioning\\([^)]*session_id".r.findFirstIn(plan).isEmpty,
        s"the (user, session) aggregate must reuse the user_id partitioning in:\n$plan")
      val userExchanges =
        "hashpartitioning\\(user_id".r.findAllIn(plan).size
      assert(userExchanges === 1,
        s"expected exactly one user_id exchange (shared by windows + session agg) in:\n$plan")
    }
  }

  test("q121 anomaly pass broadcasts the stats, scanning the fact twice") {
    withStaticPlan {
      val q = Relational.q121AnomalyZscore(spark, Sf)
      q.collect()
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"per-type stats must ride a broadcast, not a shuffle join:\n$plan")
      val scans = "Scan parquet".r.findAllIn(plan).size
      assert(scans === 2, s"expected exactly two fact scans in:\n$plan")
    }
  }

  test("q122 rolling features share one user_id exchange across both windows") {
    withStaticPlan {
      val q = Relational.q122RollingFeatures(spark, Sf)
      q.collect()
      val plan = q.queryExecution.executedPlan.toString
      val userExchanges = "hashpartitioning\\(user_id".r.findAllIn(plan).size
      assert(userExchanges === 1,
        s"both window frames must reuse a single user_id exchange in:\n$plan")
    }
  }

  test("q129 decile binning funnels only the bucket cumsum through one task") {
    withStaticPlan {
      val q = Relational.q129DecileBinning(spark, Sf)
      q.collect()
      val plan = q.queryExecution.executedPlan.toString
      // two tiny single-partition stages are inherent: the ~100-row
      // value-bucket cumsum and the 1-row total count — never the fact
      val singles = "SinglePartition".r.findAllIn(plan).size
      assert(singles === 2,
        s"only the bucket cumsum + scalar count may be single-partition in:\n$plan")
      assert(plan.contains("hashpartitioning(__b"),
        s"the fact must rank inside value-range buckets, not one task:\n$plan")
    }
  }

  test("q130 iterations never re-shuffle the adjacency (co-located join)") {
    withStaticPlan {
      // The cluster-scale claim on q130: the |E|-row degree-annotated
      // adjacency crosses the network ONCE (at its build repartition) and
      // every subsequent iteration joins it co-partitioned — the captured
      // LogicalRDD partitioning on both sides satisfies the join's
      // distribution, so each contribution pass plans exactly one
      // exchange, the |V|-sized hashpartitioning(dst) reduce. Driving the
      // extracted iteration pieces directly lets every iteration's plan
      // be inspected, not just the last.
      val (adjd, degc, nn) = Relational.pagerankFrames(spark, Sf)
      var r = Relational.pagerankInit(degc, nn)
      for (i <- 1 to 3) {
        val contribs = Relational.pagerankContribs(adjd, r)
        val plan = contribs.queryExecution.executedPlan.toString
        val exchanges = "Exchange".r.findAllIn(plan).size
        assert(exchanges === 1,
          s"iteration $i: only the dst contribution reduce may shuffle in:\n$plan")
        assert(plan.contains("hashpartitioning(dst"),
          s"iteration $i: the one exchange must be the dst reduce in:\n$plan")
        r = Relational.pagerankStep(degc, nn, contribs)
      }
      // and the ranks stay a genuine distribution: Σr ≈ Scale (fixed-
      // point floor losses only make it a hair under, never over)
      val tot = r.agg(org.apache.spark.sql.functions.sum("r"))
        .collect()(0).getLong(0)
      assert(tot <= 1000000000000L && tot > 999000000000L, s"rank mass $tot")
    }
  }

  test("q120 co-occurrence broadcasts the capped vocabulary") {
    withStaticPlan {
      val q = TextOps.q120Cooccurrence(spark, Sf)
      q.collect()
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"the top-40 vocabulary prune must be a broadcast join:\n$plan")
    }
  }

  test("q138's corpus rides one (source, bucket) exchange; only the scalar budget is single-partition") {
    withStaticPlan {
      // a prior suite's cached budgets frame would splice its ORIGINAL
      // subtree (with its own plan_ids) into this plan and skew the
      // exchange counts — pin against a fresh cache
      spark.sharedState.cacheManager.clearCache()
      val q = TextOps.q138TokenBudget(spark, Sf)
      q.collect()
      val plan = q.queryExecution.executedPlan.toString
      // the admission window shuffles by the COMPOSITE (source, md5-prefix)
      // key — a plain source partitioning would funnel each source into
      // one task; the second (source, b) exchange is the bucket-count
      // aggregate, map-side combined to constant width before it ships
      val compo = distinctExchanges(plan, "hashpartitioning\\(source#\\d+, b#")
      assert(compo === 2, s"expected window + bucket-count (source, b) exchanges in:\n$plan")
      val singles = distinctExchanges(plan, "Exchange SinglePartition")
      assert(singles === 1,
        s"only the 1-row global budget aggregate may be single-partition in:\n$plan")
    }
  }

  test("q139's sketch path is a partial aggregate — the distinct set never shuffles") {
    withStaticPlan {
      spark.sharedState.cacheManager.clearCache() // same fresh-cache rule as the q138 pin
      val q = Layout.q139KmvDistinct(spark, Sf)
      q.collect()
      val plan = q.queryExecution.executedPlan.toString
      // the sketch rides a TypedImperativeAggregate: partial + final
      // ObjectHashAggregate around ONE exchange; a (event_type, h)
      // hash-distinct exchange would mean the full distinct set is
      // being materialized again (the pre-r9 shape)
      assert(plan.contains("ObjectHashAggregate"),
        s"the KMV sketch must plan as an object-hash partial aggregate in:\n$plan")
      val dist = distinctExchanges(plan, "hashpartitioning\\(event_type#\\d+, h#")
      assert(dist === 0, s"no distinct-hash set may shuffle in:\n$plan")
      assert(plan.contains("BroadcastHashJoin"),
        s"the sketch↔exact join must be a broadcast join:\n$plan")
      assert(!plan.contains("SinglePartition"),
        s"no stage may funnel into one task in:\n$plan")
      // KmvSpec's plan pin additionally bounds the shuffled record count
      // to tasks × groups — the O(partitions × k) guarantee
    }
  }
}
