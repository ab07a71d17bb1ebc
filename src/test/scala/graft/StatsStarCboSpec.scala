package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.plans.logical.Join
import org.apache.spark.sql.functions._

import graft.operators.{KmvTable, StatsJoin}
import graft.plans.{JoinSynopsis, KeySynopsis}

/** r12 verdict #6 — the STAR shape planned from the catalog: q170's
  * shared dimension (signup) is calibrated against BOTH facts (error,
  * view), so the injected rowCount is the MAX across the two recorded
  * calibrations — the first *executed-plan* consumer of the r12
  * last-calibration-wins fix. The query is written in the bad literal
  * order (error ⋈ signup first); with calibrated stats + the view
  * value histogram, CBO must schedule the filtered view side first.
  * Stats-off the literal order stands and results are identical.
  *
  * Also pins the r12 verdict-#2 freshness short-circuit on the shared
  * runner: an unchanged feed stamp skips BOTH the register/sync pass
  * and the statistics injection; a stale stamp re-runs both and the
  * re-injected statistics track the appended population; the stats-off
  * arm unregisters the refresher so a maintenance commit can no longer
  * re-inject under the 'no stats' baseline (r12 ADVICE).
  */
class StatsStarCboSpec extends SparkSpec {

  private def innermostJoinTables(df: DataFrame): Set[String] = {
    val joins = df.queryExecution.optimizedPlan.collect { case j: Join => j }
    joins.find(j => j.children.forall(c =>
        c.collect { case x: Join => x }.isEmpty))
      .map(_.collectLeaves().collect {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation
            if r.catalogTable.isDefined => r.catalogTable.get.identifier.table
      }.toSet).getOrElse(Set.empty)
  }

  private def withConfs[T](pairs: (String, String)*)(f: => T): T = {
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally pairs.foreach { case (k, _) => spark.conf.unset(k) }
  }

  /** q170's exact calibration arithmetic, replicated spec-side. */
  private def rowsEff(dim: KeySynopsis, fact: KeySynopsis): Long = {
    val est = JoinSynopsis.joinEst(fact, dim)
    val maxNdv = math.max(fact.distinctEst, dim.distinctEst)
    math.max(1L, math.round(est * maxNdv / fact.rows.toDouble))
  }

  private def catalogRowCount(tbl: String): Option[Long] =
    spark.sessionState.catalog.getTableMetadata(TableIdentifier(tbl))
      .stats.flatMap(_.rowCount).map(_.toLong)

  /** Rank-1 premise over the three first-join candidates the star
    * offers (all on user_id): the filtered-view pair must be cheapest. */
  private def rank1HasFilteredView(dir: String): Unit = {
    val keySyns = JoinSynopsis.fromTable(spark, dir)
    val vFilt = JoinSynopsis.build("v_filtered",
      graft.sources.Tables.events(spark, dir)
        .filter(col("user_id").isNotNull &&
          col("event_type") === "view" &&
          (col("value").cast("decimal(18,2)") * lit(100)).cast("long")
            >= StatsJoin.ThresholdCents),
      col("user_id"))
    val ranked = JoinSynopsis.cheapestJoinFirst(Seq(
      (keySyns("error"), keySyns("signup")),
      (keySyns("signup"), vFilt),
      (keySyns("error"), vFilt)))
    assert(ranked.head._1._2.name === "v_filtered",
      s"ranking premise: a filtered-view pair must be rank-1, got " +
        ranked.map { case ((a, b), e) => s"${a.name}⋈${b.name}=$e" }
          .mkString(", "))
  }

  test("q170: calibrated star stats schedule the filtered view first; " +
      "the shared dim carries the MAX over both per-fact calibrations; " +
      "stats-off keeps the literal order; results identical") {
    withConfs(
      "spark.graft.kmv.tableDir" -> TempDirs.create("graft_star_tbl"),
      "spark.graft.evlayout.dir" -> TempDirs.create("graft_star_layout")) {
      try {
        StatsJoin.clearMemo()
        rank1HasFilteredView(Sf)
        val dfOn = StatsJoin.q170StatsStarOrder(spark, Sf)
        val onInner = innermostJoinTables(dfOn)
        assert(onInner.exists(_.contains("view")),
          s"stats-on plan must schedule the filtered view join first, got $onInner")
        val rowsOn = dfOn.collect().toSeq
        assert(rowsOn.nonEmpty)
        // the MAX-accumulation pin: signup's injected rowCount must be
        // the max of its two per-fact effective cardinalities, computed
        // here with the same table-served synopses q170 consumed
        val keySyns = JoinSynopsis.fromTable(spark, Sf)
        val want = math.max(
          rowsEff(keySyns("signup"), keySyns("error")),
          rowsEff(keySyns("signup"), keySyns("view")))
        val sTbl = dfOn.queryExecution.analyzed.collect {
          case r: org.apache.spark.sql.execution.datasources.LogicalRelation
              if r.catalogTable.exists(_.identifier.table.contains("signup")) =>
            r.catalogTable.get.identifier.table
        }.head
        assert(catalogRowCount(sTbl) === Some(want),
          "the shared dim's injected rowCount must be the MAX across " +
            "its recorded per-fact calibrations")
        val (offInner, rowsOff) = withConfs("spark.graft.stats.cbo" -> "false") {
          val d = StatsJoin.q170StatsStarOrder(spark, Sf)
          (innermostJoinTables(d), d.collect().toSeq)
        }
        assert(offInner.exists(_.contains("error")) &&
          offInner.exists(_.contains("signup")) &&
          !offInner.exists(_.contains("view")),
          s"stats-off must keep the literal (error join signup first) order, got $offInner")
        assert(rowsOn === rowsOff, "the reorder must not change the result")
      } finally {
        graft.plans.SynopsisStats.clearRefresh()
        StatsJoin.clearMemo()
      }
    }
  }

  /** Null users and null values on independent residues: rows with a
    * NULL user but non-null value exist, so the pre-format-5 nullCount
    * bound (key population − value∧event_id population) UNDERestimates
    * and the exact-`nuv` pin below discriminates (r12 ADVICE). */
  private def ev(ids: Range, day: Int, types: Seq[String]) = {
    import spark.implicits._
    ids.map { i =>
      (i.toLong, java.sql.Timestamp.valueOf(f"2024-03-$day%02d 10:00:00"),
        if (i % 11 == 0) None else Some((i % 40).toLong),
        types(i % types.size),
        if (i % 7 == 0) None else Some(i / 10.0))
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
  }
  private val T = Seq("error", "signup", "view")

  test("freshness short-circuit: an unchanged stamp skips sync and " +
      "injection; a stale stamp re-runs both and the stats track the " +
      "append; stats-off unregisters the refresher") {
    val dir = TempDirs.create("graft_star_corp")
    withConfs(
      "spark.graft.kmv.tableDir" -> TempDirs.create("graft_star_tbl2"),
      "spark.graft.evlayout.dir" -> TempDirs.create("graft_star_layout2")) {
      try {
        StatsJoin.clearMemo()
        ev(1 to 600, 1, T).coalesce(1).write.parquet(s"$dir/events.parquet")
        StatsJoin.q170StatsStarOrder(spark, dir).count()
        val syncs0 = StatsJoin.regSyncs.get()
        val inj0 = StatsJoin.statsInjections.get()
        // unchanged stamp → pure memo hit: no sync, no injection
        StatsJoin.q170StatsStarOrder(spark, dir).count()
        assert(StatsJoin.regSyncs.get() === syncs0,
          "an unchanged feed stamp must not re-run the register/sync pass")
        assert(StatsJoin.statsInjections.get() === inj0,
          "an unchanged feed stamp must not re-inject statistics")
        // the view fact's injected rowCount == its key population, and
        // its injected v nullCount is EXACT (the format-5 nuv tier):
        // the fixture carries null-user∧non-null-value rows, where the
        // pre-format-5 value∧event_id bound provably underestimates
        val tbls = StatsJoin.registerTypedTables(spark, dir)
        val pop0 = spark.table(tbls("view")).count()
        assert(catalogRowCount(tbls("view")) === Some(pop0))
        def vNullStat(): Option[BigInt] =
          spark.sessionState.catalog.getTableMetadata(
            TableIdentifier(tbls("view"))).stats
            .flatMap(_.colStats.get("v")).flatMap(_.nullCount)
        val exactNulls = spark.table(tbls("view"))
          .filter(col("v").isNull).count()
        assert(vNullStat() === Some(BigInt(exactNulls)),
          "the injected value nullCount must equal the layout's exact " +
            "null population, not the value∧event_id bound")
        // stale stamp → re-sync + re-inject, stats track the append
        graft.streaming.EventsStream.landFeedFile(
          ev(601 to 900, 2, Seq("view")), s"$dir/events.parquet", "append01")
        StatsJoin.q170StatsStarOrder(spark, dir).count()
        assert(StatsJoin.regSyncs.get() > syncs0,
          "a stale feed stamp must re-run the register/sync pass")
        assert(StatsJoin.statsInjections.get() > inj0,
          "a stale feed stamp must re-inject statistics")
        assert(catalogRowCount(tbls("view")) ===
          Some(spark.table(tbls("view")).count()),
          "re-injected statistics must track the appended population")
        assert(vNullStat() === Some(BigInt(
          spark.table(tbls("view")).filter(col("v").isNull).count())),
          "the exact nullCount must track the append too")
        // stats-off: stats cleared AND the refresher unregistered — a
        // later maintenance commit must NOT re-inject the baseline away
        withConfs("spark.graft.stats.cbo" -> "false") {
          StatsJoin.q170StatsStarOrder(spark, dir).count()
        }
        assert(catalogRowCount(tbls("view")).isEmpty,
          "stats-off must clear the fact's catalog statistics")
        graft.streaming.EventsStream.landFeedFile(
          ev(901 to 1000, 3, Seq("error")), s"$dir/events.parquet", "append02")
        KmvTable.maintain(spark, dir).count()
        assert(catalogRowCount(tbls("view")).isEmpty,
          "a maintenance commit after stats-off must not re-inject " +
            "(the refresher was unregistered)")
      } finally {
        graft.plans.SynopsisStats.clearRefresh()
        StatsJoin.clearMemo()
      }
    }
  }

  /** Skewed fixture for the alias pins. The user index derives from
    * i/4, DECOUPLED from the i%4 type cycle (the replica-geometry
    * trap: residue-coupled keys make cross-type joins empty by
    * parity). error is hot on keys 0..7; view uniform over 0..39;
    * signup leans 75% onto error's hot keys — so signup's effective
    * cardinality against error (skew-aligned) provably exceeds its
    * calibration against view (near-uniform). */
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

  test("per-(dim,fact) calibrated aliases carry each pair's EXACT " +
      "rows_eff while the shared base table keeps the MAX; a chain " +
      "consumer over an alias executes the filtered side first") {
    val dir = TempDirs.create("graft_star_alias_corp")
    withConfs(
      "spark.graft.kmv.tableDir" -> TempDirs.create("graft_star_alias_tbl"),
      "spark.graft.evlayout.dir" -> TempDirs.create("graft_star_alias_lay")) {
      try {
        StatsJoin.clearMemo()
        evSkew(1 to 4000, 1).coalesce(1).write.parquet(s"$dir/events.parquet")
        val aliases = StatsJoin.registerCalibratedAliases(
          spark, dir, "signup", Seq("error", "view"))
        val keySyns = JoinSynopsis.fromTable(spark, dir)
        val we = rowsEff(keySyns("signup"), keySyns("error"))
        val wv = rowsEff(keySyns("signup"), keySyns("view"))
        assert(we != wv,
          s"fixture must make the two calibrations differ, got $we/$wv")
        // each alias carries ITS pair's exact number — no MAX
        assert(catalogRowCount(aliases("error")) === Some(we))
        assert(catalogRowCount(aliases("view")) === Some(wv))
        // the base table, after the shared star consumer, carries the
        // conservative MAX across both facts
        StatsJoin.q170StatsStarOrder(spark, dir).count()
        val tbls = StatsJoin.registerTypedTables(spark, dir)
        assert(catalogRowCount(tbls("signup")) === Some(math.max(we, wv)))
        // and the aliases' exact numbers survived the base injection
        // (separate catalog entries, separate calibration epochs)
        assert(catalogRowCount(aliases("error")) === Some(we))
        assert(catalogRowCount(aliases("view")) === Some(wv))
        // executed-plan pin: a single-fact chain addressed at the alias
        // (error ⋈ signup__for_error ⋈ filtered-error) schedules the
        // FILTERED side first under CBO — planned entirely from the
        // alias's exact per-pair statistics
        val s = spark.newSession()
        s.conf.set("spark.sql.cbo.enabled", "true")
        s.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
        (Seq(tbls("error"), tbls("view"), aliases("error"),
          aliases("view"))).foreach(t => s.catalog.refreshTable(t))
        val q = s.sql(
          s"""SELECT s.d AS d, COUNT(*) AS n
             |FROM ${tbls("error")} e
             |JOIN ${aliases("error")} s ON e.user_id = s.user_id
             |JOIN ${tbls("error")} e2 ON s.user_id = e2.user_id
             |WHERE e2.v >= 100
             |GROUP BY s.d ORDER BY d""".stripMargin)
        val inner = innermostJoinTables(q)
        assert(q.count() > 0)
        assert(inner.exists(_.contains("__for_error")),
          s"the chain over the alias must join through the alias, got $inner")
      } finally {
        graft.plans.SynopsisStats.clearRefresh()
        StatsJoin.clearMemo()
      }
    }
  }

  /** q185's chain is a SELF-join of error through the alias, so the
    * innermost join's table set is identical in both orders — the
    * discriminator is whether the innermost join carries the
    * threshold FILTER (the filtered instance joined first). */
  private def innermostHasThreshold(df: DataFrame): Boolean = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter}
    val joins = df.queryExecution.optimizedPlan.collect { case j: Join => j }
    joins.find(j => j.children.forall(c =>
        c.collect { case x: Join => x }.isEmpty))
      .exists(_.children.exists(c =>
        c.collect { case f: LFilter => f }.exists(_.condition.collectFirst {
          case l @ Literal(v: Long, _)
            if v == StatsJoin.ThresholdCents => l
        }.nonEmpty)))
  }

  test("q185: the DECLARED alias consumer — stats-on schedules the " +
      "filtered error instance first (through the alias's exact " +
      "calibration); stats-off keeps the literal order; results equal") {
    withConfs(
      "spark.graft.kmv.tableDir" -> TempDirs.create("graft_q185_tbl"),
      "spark.graft.evlayout.dir" -> TempDirs.create("graft_q185_lay")) {
      try {
        StatsJoin.clearMemo()
        val dfOn = StatsJoin.q185StatsAliasOrder(spark, Sf)
        val rowsOn = dfOn.collect().toSeq
        assert(rowsOn.nonEmpty)
        assert(innermostHasThreshold(dfOn),
          "stats-on must schedule the FILTERED error instance first")
        // the query's dim relation is the alias, and it carries its
        // exact single-fact calibration (no MAX)
        val aliasTbl = dfOn.queryExecution.analyzed.collect {
          case r: org.apache.spark.sql.execution.datasources.LogicalRelation
              if r.catalogTable.exists(_.identifier.table
                .contains("__for_error")) =>
            r.catalogTable.get.identifier.table
        }.headOption.getOrElse(fail("q185 must read through the alias"))
        val keySyns = JoinSynopsis.fromTable(spark, Sf)
        assert(catalogRowCount(aliasTbl) ===
          Some(rowsEff(keySyns("signup"), keySyns("error"))))
        val (offHasThresholdFirst, rowsOff) =
          withConfs("spark.graft.stats.cbo" -> "false") {
            val d = StatsJoin.q185StatsAliasOrder(spark, Sf)
            (innermostHasThreshold(d), d.collect().toSeq)
          }
        assert(!offHasThresholdFirst,
          "stats-off must keep the literal (unfiltered-first) order")
        assert(rowsOn === rowsOff, "the reorder must not change the result")
      } finally {
        graft.plans.SynopsisStats.clearRefresh()
        StatsJoin.clearMemo()
      }
    }
  }

  test("q170 sf10: executed join order schedules the filtered view first " +
      "(prewarmed replica)") {
    val sf10 = "/tmp/sf10"
    assume(new java.io.File(s"$sf10/events.parquet").exists,
      "sf10 replica absent")
    val root = KmvTable.tableRoot(spark, sf10)
    val warm = Option(new java.io.File(root).listFiles()).exists(_.exists(g =>
      g.getName.startsWith("gen-") &&
        new java.io.File(g, KmvTable.FormatMarker).exists &&
        new java.io.File(g, "_COMMITTED").exists))
    assume(warm, "sf10 sketch table not prewarmed at the current format")
    try {
      rank1HasFilteredView(sf10)
      val dfOn = StatsJoin.q170StatsStarOrder(spark, sf10)
      val onInner = innermostJoinTables(dfOn)
      assert(onInner.exists(_.contains("view")),
        s"sf10 stats-on plan must schedule the filtered view first, got $onInner")
      assert(dfOn.count() > 0)
    } finally graft.plans.SynopsisStats.clearRefresh()
  }
}
