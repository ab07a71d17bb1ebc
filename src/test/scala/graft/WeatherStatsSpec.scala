package graft

import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec}
import org.apache.spark.sql.functions._

import graft.plans.SynopsisStats
import graft.weather.{WeatherPipeline, WeatherQueries, WeatherStats}

/** r11 verdict #6 — the flagship gold build plans its J1/J2 broadcasts
  * from INJECTED catalog statistics, with the hand `broadcast()` hints
  * removed: (a) the plan carries no hint node anywhere and still
  * broadcast-joins both dims; (b) the dim relation's planner size is
  * exactly the injected statistic, not the file size; (c) causality —
  * varying ONLY the injected number moves the physical decision: the
  * join's BUILD SIDE follows the injected sizes (at fixture scale both
  * sides sit under the broadcast threshold, so the side CHOICE — the
  * argmin of the two size estimates — is the statistics-driven
  * decision; at production scale the fact side leaves the threshold
  * and the same estimates decide broadcast-vs-shuffle). Decision pins
  * read `sparkPlan` (the static physical plan): that is the plan
  * statistics drive — AQE may later rescue a mis-planned join from
  * runtime sizes, which is exactly what the statistics path makes
  * unnecessary.
  */
class WeatherStatsSpec extends SparkSpec {

  private def joinSides(df: org.apache.spark.sql.DataFrame) = (
    df.queryExecution.sparkPlan.collect {
      case j: BroadcastHashJoinExec => j.buildSide.toString },
    df.queryExecution.sparkPlan.collect {
      case j: BroadcastNestedLoopJoinExec => j.buildSide.toString })

  test("gold J1/J2 broadcast from injected stats, hint-free; build side follows the injected size") {
    // pin every conf the broadcast decision reads to its default for
    // the duration (suite-order independence: a sibling suite's leaked
    // threshold would otherwise flip these plans), and record the plan
    // in each failure message
    val pinned = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> (10L << 20).toString,
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> (10L << 20).toString,
      "spark.sql.cbo.enabled" -> "false")
    val saved = pinned.map { case (k, _) => k -> spark.conf.getOption(k) }
    pinned.foreach { case (k, v) => spark.conf.set(k, v) }
    try runPinned() finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def runPinned(): Unit = {
    // drop the memoized weather frames first: a gold plan CACHED by an
    // earlier suite would be substituted under this spec's freshly-built
    // plan by the CacheManager (canonicalized-subtree matching), leaving
    // an InMemoryTableScan where the live joins should be — the pins
    // here are about the PLANNING of those joins, so they must plan live
    // (found as an order-dependent in-suite failure; standalone runs had
    // no cached gold to match)
    WeatherQueries.clear()
    // ... and the dim registration memo (same lesson, statistics tier):
    // this spec perturbs and restores the dims' catalog statistics, so
    // every dims() call below must actually re-inject
    WeatherStats.clearMemo()
    val (st, pc) = WeatherStats.dims(spark, Sf)
    val (stTbl, pcTbl) = WeatherStats.dimTableNames(Sf)
    val stRows = st.count()
    val pcRows = pc.count()

    // (b) the planner reads the INJECTED size (rows x 64B), not the file's
    val injected = spark.table(stTbl).queryExecution.optimizedPlan.stats
    assert(injected.sizeInBytes === BigInt(stRows * 64),
      s"dim size must be the injected statistic, got ${injected.sizeInBytes}")
    // rowCount reaches plan stats only under CBO (size-only visitor
    // otherwise) — read it the way a cost-based rule would
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try assert(spark.table(stTbl).queryExecution.optimizedPlan.stats
      .rowCount.contains(BigInt(stRows)))
    finally spark.conf.unset("spark.sql.cbo.enabled")

    def goldPlan() = WeatherPipeline.aggregateToPostal(
      WeatherQueries.stgObs(spark, Sf), spark.table(stTbl),
      spark.table(pcTbl), "observation")

    // (a) hint-free, both joins still broadcast
    val gold = goldPlan()
    assert(gold.queryExecution.analyzed.collect {
      case h: ResolvedHint => h }.isEmpty, "no hint may remain in the plan")
    val (bhj0, bnlj0) = joinSides(gold)
    assert(bhj0.nonEmpty, "J1 must plan as a broadcast hash join; plan:\n" +
      gold.queryExecution.sparkPlan.toString)
    assert(bnlj0.nonEmpty, "J2 must plan as a broadcast nested loop join; plan:\n" +
      gold.queryExecution.sparkPlan.toString)
    assert(bnlj0.head === "BuildRight",
      s"honest stats: the KB-sized postal dim (right) is the built side, got $bnlj0")
    assert(gold.count() > 0)

    try {
      // (c) causality, J2: inflate ONLY postal's injected size past the
      // broadcast threshold — the planner must REFUSE the broadcast the
      // honest statistic justified (the radius join degrades to a
      // cartesian product: the other input is a join whose size-only
      // estimate is far over threshold too, so no broadcast candidate
      // remains)
      val synPc = graft.plans.JoinSynopsis.build(
        pcTbl, spark.table(pcTbl), col("postal_code"))
      SynopsisStats.inject(spark, pcTbl, synPc.rows,
        Map("postal_code" -> synPc), avgRowBytes = 1L << 20)
      val big = goldPlan()
      val (_, bnljBig) = joinSides(big)
      assert(bnljBig.isEmpty,
        "an over-threshold injected size must block the J2 broadcast")
      assert(big.queryExecution.sparkPlan.collect {
        case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
      }.nonEmpty, "the refused broadcast must fall back to a cartesian join")
      WeatherStats.clearMemo()
      WeatherStats.dims(spark, Sf) // restore postal

      // (c) causality, J1: deflate stations to ~rows bytes — the join must
      // now build the stations side (the choice is the argmin of the two
      // injected/estimated sizes)
      val synSt = graft.plans.JoinSynopsis.build(
        stTbl, spark.table(stTbl), col("station_id"))
      SynopsisStats.inject(spark, stTbl, synSt.rows,
        Map("station_id" -> synSt), avgRowBytes = 1L)
      val (bhjTiny, _) = joinSides(goldPlan())
      assert(bhjTiny.head === "BuildRight",
        s"J1's build side must follow the injected size, got $bhjTiny")
    } finally {
      // restore honest statistics and confirm the original decisions
      WeatherStats.clearMemo()
      WeatherStats.dims(spark, Sf)
      ()
    }
    val (bhjBack, bnljBack) = joinSides(goldPlan())
    assert(bhjBack === bhj0 && bnljBack === bnlj0,
      "re-injecting the honest synopses must restore the original plan")
    assert(pcRows > 0 && stRows > 0)
  }

  test("dims registration is memoized on the source stamp; a mutated " +
      "source re-lands and re-points (r12 verdict #3 + ADVICE)") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val dir = TempDirs.create("graft_wx_corp")
    def copy(t: String): Unit = {
      Files.copy(Paths.get(s"$Sf/$t"), Paths.get(s"$dir/$t"),
        StandardCopyOption.REPLACE_EXISTING)
      ()
    }
    Seq("customer.parquet", "nation.parquet").foreach(copy)
    WeatherStats.clearMemo()
    val (stTbl, _) = WeatherStats.dimTableNames(dir)
    WeatherStats.dims(spark, dir)
    val honest = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(stTbl)).stats
    assert(honest.exists(_.rowCount.isDefined))
    // memo hit: a direct perturbation SURVIVES a repeat dims call —
    // proof the repeat call did none of the DDL/build/inject work
    val syn = graft.plans.JoinSynopsis.build(
      stTbl, spark.table(stTbl), col("station_id"))
    SynopsisStats.inject(spark, stTbl, syn.rows,
      Map("station_id" -> syn), avgRowBytes = 4096)
    WeatherStats.dims(spark, dir)
    val perturbed = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(stTbl)).stats
    assert(perturbed.map(_.sizeInBytes) !== honest.map(_.sizeInBytes),
      "an unchanged source stamp must be a pure memo hit (no re-injection)")
    // mutate the SOURCE (customer feeds stations): fresh mtime/len →
    // stale stamp → re-land to a new stamp-addressed dir, re-point the
    // table, re-inject honest statistics — no clearMemo involved
    val loc0 = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(stTbl)).location
    graft.sources.Tables.customer(spark, Sf).limit(80).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val (st2, _) = WeatherStats.dims(spark, dir)
    val loc1 = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(stTbl)).location
    assert(loc1 !== loc0, "a mutated source must re-land to a new dir")
    val restored = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(stTbl)).stats
    assert(restored.exists(_.rowCount.contains(BigInt(st2.count()))),
      "the re-pointed table must carry fresh honest statistics")
  }
}
