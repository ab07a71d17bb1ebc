package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.plans.logical.Join
import org.apache.spark.sql.functions._

import graft.operators.StatsJoin
import graft.plans.{JoinSynopsis, KeySynopsis, StarAliasReorder}

/** r16 #2 — alias-aware star planning (q186): UNMODIFIED multi-fact
  * star SQL over the base typed tables is planned against the EXACT
  * per-(dim, fact) calibrations via [[graft.plans.StarAliasReorder]].
  * Pins:
  * (1) stats-on, the rule fires: the executed innermost join is the
  *     CHEAPEST edge by the per-pair numbers (the filtered view side
  *     in the skew fixture), and the dim relation in the plan is that
  *     edge's ALIAS table — whose catalog rowCount is the spec-computed
  *     exact pair rows_eff, not the MAX;
  * (2) stats-off, the aliases carry no statistics, the rule bails and
  *     the literal order stands;
  * (3) results are identical on both arms. */
class StarAliasReorderSpec extends SparkSpec {

  private def withConfs[T](pairs: (String, String)*)(f: => T): T = {
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally pairs.foreach { case (k, _) => spark.conf.unset(k) }
  }

  private def rowsEff(dim: KeySynopsis, fact: KeySynopsis): Long = {
    val est = JoinSynopsis.joinEst(fact, dim)
    val maxNdv = math.max(fact.distinctEst, dim.distinctEst)
    math.max(1L, math.round(est * maxNdv / fact.rows.toDouble))
  }

  private def innermostJoinTables(df: DataFrame): Set[String] = {
    val joins = df.queryExecution.optimizedPlan.collect { case j: Join => j }
    joins.find(j => j.children.forall(c =>
        c.collect { case x: Join => x }.isEmpty))
      .map(_.collectLeaves().collect {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation
            if r.catalogTable.isDefined => r.catalogTable.get.identifier.table
      }.toSet).getOrElse(Set.empty)
  }

  /** The StatsStarCboSpec skew fixture: error hot on keys 0..7, view
    * near-uniform over 0..39, signup leaning 75% onto error's hot keys
    * — the two per-fact calibrations provably differ. */
  private def evSkew(ids: Range, day: Int) = {
    import spark.implicits._
    ids.map { i =>
      val t = Seq("error", "signup", "view", "view")(i % 4)
      val j = i / 4
      val u = t match {
        case "error" => (j % 8).toLong
        case "view" => (j % 40).toLong
        case _ => if (j % 4 != 0) (j % 8).toLong else (j % 40).toLong
      }
      (i.toLong, java.sql.Timestamp.valueOf(f"2024-03-$day%02d 10:00:00"),
        Some(u): Option[Long], t,
        if (i % 7 == 0) None else Some(i / 10.0))
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
  }

  test("q186: unmodified star SQL plans its first edge from the exact " +
      "per-pair calibration through the alias; stats-off keeps the " +
      "literal order; results identical") {
    val dir = TempDirs.create("graft_staralias_corp")
    withConfs(
      "spark.graft.kmv.tableDir" -> TempDirs.create("graft_staralias_tbl"),
      "spark.graft.evlayout.dir" -> TempDirs.create("graft_staralias_lay")) {
      try {
        StatsJoin.clearMemo()
        evSkew(1 to 4000, 1).coalesce(1).write.parquet(s"$dir/events.parquet")
        val keySyns = JoinSynopsis.fromTable(spark, dir)
        val we = rowsEff(keySyns("signup"), keySyns("error"))
        val wv = rowsEff(keySyns("signup"), keySyns("view"))
        assert(we > wv, s"skew premise: signup⋈error must exceed " +
          s"signup⋈view, got $we/$wv")
        val rw0 = StarAliasReorder.rewrites.get()
        val dfOn = StatsJoin.q186StatsStarAlias(spark, dir)
        val rowsOn = dfOn.collect().toSeq
        assert(rowsOn.nonEmpty)
        assert(StarAliasReorder.rewrites.get() > rw0,
          "the alias-aware rule must fire on the stats-on arm")
        val chosen = StarAliasReorder.lastChosenAlias.get()
        assert(chosen.contains("signup__for_view"),
          s"the cheapest edge (filtered near-uniform view) must be " +
            s"chosen, got '$chosen'")
        val inner = innermostJoinTables(dfOn)
        assert(inner.exists(_.contains("__for_view")) &&
          inner.exists(t => t.contains("view") && !t.contains("__for_")),
          s"the executed innermost join must be filtered-view ⋈ its " +
            s"alias, got $inner")
        // the alias the plan consumed carries the pair's EXACT number
        val aliasRows = spark.sessionState.catalog
          .getTableMetadata(TableIdentifier(chosen))
          .stats.flatMap(_.rowCount).map(_.toLong)
        assert(aliasRows === Some(wv),
          "the substituted alias must carry the exact pair rows_eff, " +
            "not the MAX")
        // stats-off: no statistics on the aliases → the rule bails →
        // the literal (error ⋈ signup first) order stands
        val (offInner, rowsOff, rwOffDelta) =
          withConfs("spark.graft.stats.cbo" -> "false") {
            val r0 = StarAliasReorder.rewrites.get()
            val d = StatsJoin.q186StatsStarAlias(spark, dir)
            val rows = d.collect().toSeq
            (innermostJoinTables(d), rows,
              StarAliasReorder.rewrites.get() - r0)
          }
        assert(rwOffDelta === 0L,
          "the rule must bail when the aliases carry no statistics")
        assert(offInner.exists(t => t.contains("error") && !t.contains("__for_")) &&
          offInner.exists(t => t.contains("signup") && !t.contains("__for_")) &&
          !offInner.exists(_.contains("view")),
          s"stats-off must keep the literal order, got $offInner")
        assert(rowsOn === rowsOff, "the rewrite must not change the result")
      } finally {
        graft.plans.SynopsisStats.clearRefresh()
        StatsJoin.clearMemo()
      }
    }
  }
}
