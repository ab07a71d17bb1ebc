package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.functions._

import graft.plans.{JoinSynopsis, SynopsisCatalog}
import graft.sources.Tables

/** The q157 join synopsis CONSUMED in planning decisions (r9 verdict
  * #2): (a) on the CboReorderSpec join chain, the greedy
  * synopsis-estimated order picks the same first join Spark's
  * ANALYZE-stats CBO picks; (b) under frequency skew, two dimensions
  * with IDENTICAL rows and NDV — indistinguishable to Spark's
  * uniform-frequency join estimator, pinned via its own stats — are
  * correctly ranked by the frequency-annotated synopsis (~50× true
  * size gap, estimated EXACTLY because the key union saturates the
  * sketch); (c) a registered synopsis estimate drives an automatic
  * BROADCAST hint through [[graft.plans.SketchBroadcastHint]] where
  * size-stats-based planning would sort-merge join.
  */
class SynopsisCboSpec extends SparkSpec {

  private def leafOrder(p: LogicalPlan): Seq[String] = p.collect {
    case j: Join => j
  }.headOption.map(_.collectLeaves().map(_.toString.take(60)).toSeq)
    .getOrElse(Seq.empty)

  test("synopsis greedy order matches the ANALYZE-stats CBO order") {
    val names = Seq("syn_lineitem", "syn_part", "syn_supplier")
    names.foreach(n => spark.sql(s"DROP TABLE IF EXISTS $n"))
    try {
      Tables.lineitem(spark, Sf).write.mode("overwrite").saveAsTable("syn_lineitem")
      Tables.part(spark, Sf).write.mode("overwrite").saveAsTable("syn_part")
      Tables.supplier(spark, Sf).write.mode("overwrite").saveAsTable("syn_supplier")
      names.foreach(n => spark.sql(s"ANALYZE TABLE $n COMPUTE STATISTICS FOR ALL COLUMNS"))
      val sql =
        """SELECT l.l_orderkey, p.p_brand, s.s_name
          |FROM syn_lineitem l
          |JOIN syn_part p ON l.l_partkey = p.p_partkey
          |JOIN syn_supplier s ON l.l_suppkey = s.s_suppkey
          |WHERE s.s_nationkey = 3""".stripMargin
      val keys = Seq("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled")
      keys.foreach(k => spark.conf.set(k, "true"))
      val cboOrder = try leafOrder(spark.sql(sql).queryExecution.optimizedPlan)
        finally keys.foreach(spark.conf.unset)
      val supplierFirst = cboOrder.indexWhere(_.contains("syn_supplier")) <
        cboOrder.indexWhere(_.contains("syn_part"))
      assert(supplierFirst, s"expected CBO to schedule supplier first: $cboOrder")

      // the synopsis path: one KB synopsis per (table, join key) — the
      // filtered dim's synopsis is built on the filtered frame, which is
      // what a sampling-based planner sees post-selection
      val l = spark.table("syn_lineitem")
      val sP = JoinSynopsis.build("syn_part", spark.table("syn_part"),
        col("p_partkey"))
      val sS = JoinSynopsis.build("syn_supplier",
        spark.table("syn_supplier").filter(col("s_nationkey") === 3),
        col("s_suppkey"))
      val lPart = JoinSynopsis.build("l_by_part", l, col("l_partkey"))
      val lSupp = JoinSynopsis.build("l_by_supp", l, col("l_suppkey"))
      val ranked = JoinSynopsis.cheapestJoinFirst(
        Seq((lSupp, sS), (lPart, sP)))
      assert(ranked.head._1._2.name === "syn_supplier",
        s"synopsis order must match the CBO order, got ${ranked.map(r => r._1._2.name -> r._2)}")
    } finally names.foreach(n => spark.sql(s"DROP TABLE IF EXISTS $n"))
  }

  test("frequency skew: synopsis ranks what NDV-uniform stats cannot") {
    import spark.implicits._
    // fact: hot key 0 carries half the rows; keys 1..59 are cold
    val fact = (1 to 8000).map(i =>
      (if (i <= 4000) 0L else (i % 59 + 1).toLong, i.toLong))
      .toDF("k", "payload")
    // two dims with IDENTICAL (rows=600, ndv=60) — A's heavy key is the
    // fact's HOT key, B's heavy key is a COLD one (and key 60 misses)
    val dimA = ((1 to 541).map(_ => 0L) ++ (1L to 59L)).map(k => (k, "a"))
      .toDF("k", "tag")
    val dimB = ((1 to 541).map(_ => 1L) ++ (2L to 60L)).map(k => (k, "b"))
      .toDF("k", "tag")
    val trueA = fact.join(dimA, "k").count()
    val trueB = fact.join(dimB, "k").count()
    assert(trueA > trueB * 20, s"skew fixture degenerate: $trueA vs $trueB")

    // Spark's own estimator, via its stats: identical-by-construction
    val names = Seq("skw_fact", "skw_a", "skw_b")
    names.foreach(n => spark.sql(s"DROP TABLE IF EXISTS $n"))
    try {
      fact.write.mode("overwrite").saveAsTable("skw_fact")
      dimA.write.mode("overwrite").saveAsTable("skw_a")
      dimB.write.mode("overwrite").saveAsTable("skw_b")
      names.foreach(n => spark.sql(s"ANALYZE TABLE $n COMPUTE STATISTICS FOR ALL COLUMNS"))
      spark.conf.set("spark.sql.cbo.enabled", "true")
      def joinRowEst(dim: String): BigInt = try {
        spark.sql(s"SELECT * FROM skw_fact f JOIN $dim d ON f.k = d.k")
          .queryExecution.optimizedPlan.stats.rowCount
          .getOrElse(fail(s"no CBO rowCount for $dim join"))
      } finally ()
      val (estA, estB) = (joinRowEst("skw_a"), joinRowEst("skw_b"))
      spark.conf.unset("spark.sql.cbo.enabled")
      assert(estA === estB,
        s"NDV-uniform stats should be blind to the skew: $estA vs $estB")

      // the frequency-annotated synopsis: key union (61) <= k (64), so
      // the sketch is saturated and the estimates are EXACT
      val sF = JoinSynopsis.build("skw_fact", fact, col("k"))
      val sA = JoinSynopsis.build("skw_a", dimA, col("k"))
      val sB = JoinSynopsis.build("skw_b", dimB, col("k"))
      val eA = JoinSynopsis.joinEst(sF, sA)
      val eB = JoinSynopsis.joinEst(sF, sB)
      assert(math.round(eA) === trueA, s"saturated estimate must be exact: $eA vs $trueA")
      assert(math.round(eB) === trueB, s"saturated estimate must be exact: $eB vs $trueB")
      assert(eB < eA, "synopsis must rank the cold-aligned dim cheaper")
    } finally names.foreach(n => spark.sql(s"DROP TABLE IF EXISTS $n"))
  }

  test("registered synopsis estimate drives an automatic broadcast hint") {
    withExtSession { s =>
      import s.implicits._
      SynopsisCatalog.clear()
      (1L to 50000L).map(i => (i % 1000, i)).toDF("k", "v")
        .createOrReplaceTempView("syn_fact")
      (1L to 400L).map(i => (i, s"d$i")).toDF("k", "name")
        .createOrReplaceTempView("syn_dim")
      // no size stats can help: broadcast thresholds off in both the
      // static planner and AQE
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      s.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val sql = "SELECT f.k, f.v, d.name FROM syn_fact f JOIN syn_dim d ON f.k = d.k"
      def planOf(df: DataFrame): String = {
        df.collect()
        df.queryExecution.executedPlan.toString
      }
      // without the rule's flag: sort-merge (nothing says dim is small)
      val off = planOf(s.sql(sql))
      assert(!off.contains("BroadcastHashJoin"), s"unexpected broadcast:\n$off")

      // register the dim's synopsis (unique key: distinct estimate ==
      // row estimate) and opt in — the hint rule fires
      JoinSynopsis.build("syn_dim", s.table("syn_dim"), col("k")) match {
        case syn => SynopsisCatalog.register(syn)
      }
      s.conf.set("spark.graft.synopsis.autoBroadcast", "true")
      try {
        val on = planOf(s.sql(sql))
        assert(on.contains("BroadcastHashJoin"),
          s"synopsis-driven hint must broadcast the dim:\n$on")
        // user precedence: an explicit hint on EITHER side means the
        // user already chose — the rule must not add a second hint
        // (at post-hoc resolution the join's own hint slot is always
        // NONE; user hints are still ResolvedHint children)
        val userHinted = s.sql(
          "SELECT /*+ BROADCAST(f) */ f.k, f.v, d.name " +
            "FROM syn_fact f JOIN syn_dim d ON f.k = d.k")
        userHinted.collect()
        val analyzed = userHinted.queryExecution.analyzed
        val hints = analyzed.collect {
          case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
        }
        assert(hints.size === 1,
          s"user hint present => rule must stand down, found ${hints.size} hints")
      } finally {
        s.conf.unset("spark.graft.synopsis.autoBroadcast")
        SynopsisCatalog.clear()
      }
    }
  }

  test("addressing contract: only the innermost (view-level) alias matches") {
    withExtSession { s =>
      import s.implicits._
      SynopsisCatalog.clear()
      (1L to 50000L).map(i => (i % 1000, i)).toDF("k", "v")
        .createOrReplaceTempView("addr_fact")
      (1L to 400L).map(i => (i, s"d$i")).toDF("k", "name")
        .createOrReplaceTempView("addr_dim")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      s.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      s.conf.set("spark.graft.synopsis.autoBroadcast", "true")
      val sql = "SELECT f.k, f.v, d.name FROM addr_fact f JOIN addr_dim d ON f.k = d.k"
      def plan(): String = {
        val df = s.sql(sql); df.collect(); df.queryExecution.executedPlan.toString
      }
      try {
        // registered under the QUERY-LOCAL alias 'd': must NOT fire —
        // a short rename anywhere in the session is not an address
        // (the r10 ADVICE hijack scenario)
        SynopsisCatalog.register("d", 400L)
        assert(!plan().contains("BroadcastHashJoin"),
          "outer-alias registration must not attach a hint")
        SynopsisCatalog.clear()
        // registered under the view-level name: fires through the
        // rename, because the chain TERMINATES in addr_dim
        SynopsisCatalog.register("addr_dim", 400L)
        assert(plan().contains("BroadcastHashJoin"),
          "view-level registration must match through the alias chain")
      } finally {
        s.conf.unset("spark.graft.synopsis.autoBroadcast")
        SynopsisCatalog.clear()
      }
    }
  }
}
