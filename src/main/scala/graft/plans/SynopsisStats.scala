package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.catalog.{CatalogColumnStat, CatalogStatistics}

/** [[KeySynopsis]] fed into CATALYST'S OWN statistics (r10 verdict #3):
  * instead of special-casing one planning decision per rule (the
  * [[SketchBroadcastHint]] route), the synopsis is written where
  * ANALYZE would have written — the table's `CatalogStatistics`
  * (rowCount, sizeInBytes, per-column NDV) — so Spark's OWN machinery
  * consumes it everywhere statistics flow: `CostBasedJoinReorder`
  * (CBO on), `JoinEstimation`, and size-threshold broadcast planning
  * (CBO on or off — `LogicalRelation.computeStats` prefers catalog
  * stats over file sizes in both modes). No table scan ever runs; the
  * numbers come from the KB-sized synopsis built in one pass.
  *
  * Two tiers:
  *
  *  - [[injectFromSynopsis]] — the ANALYZE-equivalent: exact row count
  *    (Σ of kept-key frequencies comes off the synopsis build pass)
  *    plus the bottom-k NDV estimate per join key. This alone
  *    activates CBO reorder/estimation on tables ANALYZE never
  *    touched.
  *  - [[injectCalibrated]] — the part ANALYZE statistics CANNOT
  *    express: Spark's join estimator is uniform-frequency
  *    (|A⋈B| = rows_A·rows_B / max(ndv_A, ndv_B)), so two dimensions
  *    with identical (rows, ndv) are indistinguishable to it no matter
  *    how exact the stats (SynopsisCboSpec pins the blindness with
  *    ANALYZE-exact statistics). The frequency-annotated synopsis
  *    knows the true join size ([[JoinSynopsis.joinEst]] — exact at
  *    saturation); calibration collapses it into an EFFECTIVE
  *    cardinality for the dimension,
  *
  *      rows_eff = joinEst · max(ndv_F, ndv_D) / rows_F,
  *
  *    chosen so Spark's own uniform formula reproduces the synopsis
  *    estimate exactly. The planner then reorders/broadcasts from
  *    frequency-skew information through an interface that only
  *    carries per-relation numbers. (Effective stats are per
  *    fact-dimension pair — the star-join shape q158 ranks; a
  *    dimension reused against several facts keeps the MAX rows_eff
  *    across its recorded calibrations — exact for the hot-aligned
  *    pair, a conservative over-estimate for the rest, never the
  *    under-estimate that last-writer-wins handed the first fact.)
  *
  * SynopsisStatsSpec is the executed-plan proof: a 3-table chain
  * reorders under injected stats alone (CBO on, ANALYZE never run)
  * matching the true-size order in the skew case NDV statistics
  * provably cannot rank, the first executed join is
  * [[JoinSynopsis.cheapestJoinFirst]]'s rank-1 choice (q158's ranking
  * machinery, re-asserted through the plan), and an injected
  * sizeInBytes flips a sort-merge join to broadcast with no hint rule
  * involved — subsuming [[SketchBroadcastHint]]'s special case at the
  * statistics tier.
  */
object SynopsisStats {

  /** Join-key column statistic off one synopsis: NDV is the bottom-k
    * estimate; min/max are the key-domain bounds the build pass carried
    * (REQUIRED for numeric keys — Catalyst turns absent bounds into a
    * NullValueInterval whose intersection test fails, collapsing every
    * join estimate to 0); nullCount 0 (synopses are built over the
    * key's non-null frame) and fixed 8-byte width (the key families
    * this engine sketches are int64/hashed) — exactly the fields
    * `JoinEstimation` needs to fire, nothing speculative. */
  private def keyStat(syn: KeySynopsis): CatalogColumnStat = CatalogColumnStat(
    distinctCount = Some(BigInt(math.max(1L, math.round(syn.distinctEst)))),
    min = syn.keyMin, max = syn.keyMax,
    nullCount = Some(BigInt(0)),
    avgLen = Some(8L), maxLen = Some(8L))

  /** Value-column statistic off one [[ValueSynopsis]]: NDV from the
    * value-KMV, true min/max/nullCount from the build pass, and the
    * equi-height HISTOGRAM sliced from the uniform row sample — the
    * statistic Catalyst's FilterEstimation needs before a range
    * predicate on a skewed column estimates anywhere near reality
    * (uniform [min,max] interpolation otherwise; SynopsisHistogramSpec
    * pins the >10x gap through executed-plan rowCounts). */
  def valueStat(vs: ValueSynopsis, numBins: Int = 32): CatalogColumnStat =
    CatalogColumnStat(
      distinctCount = Some(BigInt(math.max(1L, math.round(vs.ndvEst)))),
      min = vs.vMin.map(_.toString), max = vs.vMax.map(_.toString),
      nullCount = Some(BigInt(vs.nullCount)),
      avgLen = Some(8L), maxLen = Some(8L),
      histogram = vs.histogram(numBins))

  /** Write `rows` + per-key-column synopsis statistics as `table`'s
    * catalog statistics — exactly what ANALYZE TABLE … COMPUTE
    * STATISTICS FOR COLUMNS would persist, except no scan runs.
    * `avgRowBytes` sizes the sizeInBytes statistic (broadcast
    * thresholds compare against it). `extraCols` carries non-key
    * column statistics ([[valueStat]] histograms) into the same
    * catalog write — `rows` must then be the PHYSICAL row count
    * (non-null + null: Catalyst reads each column's null fraction as
    * nullCount/rowCount, so a non-null-only row count overstates
    * it). */
  def inject(spark: SparkSession, table: String, rows: Long,
      keyCols: Map[String, KeySynopsis], avgRowBytes: Long = 32L,
      physicalRows: Option[Long] = None,
      extraCols: Map[String, CatalogColumnStat] = Map.empty): Unit = {
    // sizeInBytes feeds BROADCAST planning and must stay the table's
    // physical cardinality; rowCount feeds JOIN-ORDER cost and may be
    // the calibrated effective cardinality. Conflating them (the
    // pre-fix shape) let a hot-aligned calibration inflate a KB dim to
    // hundreds of MB and block a correct broadcast (self-review r11).
    val stats = CatalogStatistics(
      sizeInBytes =
        BigInt(math.max(1L, physicalRows.getOrElse(rows) * avgRowBytes)),
      rowCount = Some(BigInt(math.max(0L, rows))),
      colStats = keyCols.map { case (c, s) => c -> keyStat(s) } ++ extraCols)
    spark.sessionState.catalog.alterTableStats(
      TableIdentifier(table), Some(stats))
    spark.sessionState.catalog.refreshTable(TableIdentifier(table))
  }

  /** ANALYZE-equivalent injection from one synopsis: exact rows, key
    * NDV + bounds from the bottom-k build pass. */
  def injectFromSynopsis(spark: SparkSession, table: String,
      syn: KeySynopsis, keyColumn: String, avgRowBytes: Long = 32L): Unit =
    inject(spark, table, syn.rows, Map(keyColumn -> syn), avgRowBytes)

  /** Statistics REFRESHERS, keyed by corpus dir (r11 verdict #3): a
    * consumer that injected catalog statistics derived from the
    * maintained sketch table registers a callback here, and
    * [[graft.operators.KmvTable.maintain]] fires it after every commit
    * that actually WROTE (append, rebuild, compaction — never the
    * no-op fast path), with the fresh table already committed. The
    * stale-stats window is therefore zero beyond the maintenance run
    * itself: an append updates the registered tables' rowCount / NDV /
    * histogram in the same call that updated the sketches, with no
    * ANALYZE and no second feed scan (the callbacks re-derive from the
    * table — `fromTable` inside a callback hits maintain's no-op path,
    * so no recursion). Keyed by (dir, name): re-registering the same
    * name replaces the callback (idempotent registrants like q169). */
  private val refreshers = new java.util.concurrent.ConcurrentHashMap[
    String, Map[String, SparkSession => Unit]]()

  def registerRefresh(dir: String, name: String)(
      f: SparkSession => Unit): Unit = {
    refreshers.merge(dir, Map(name -> f), (old, add) => old ++ add)
    ()
  }

  def clearRefresh(): Unit = refreshers.clear()

  /** Remove one named refresher for `dir` (no-op if absent). The
    * stats-OFF arm of an A/B consumer needs this: clearing a table's
    * catalog statistics is not enough if a registered refresher can
    * re-inject them from a maintenance commit that lands between the
    * clear and the lazy DataFrame's execution — the 'no stats'
    * baseline would silently ride injected sizeInBytes. */
  def unregisterRefresh(dir: String, name: String): Unit = {
    refreshers.computeIfPresent(dir, (_, m) => {
      val rest = m - name
      if (rest.isEmpty) null else rest
    })
    ()
  }

  /** Fired by [[graft.operators.KmvTable.maintain]] post-commit. A
    * refresher failure must not wedge the DATA maintenance that
    * already committed — it is reported, and the next maintenance (or
    * the consumer's own next injection) retries. */
  private[graft] def refreshAfterMaintain(spark: SparkSession, dir: String): Unit =
    Option(refreshers.get(dir)).foreach(_.foreach { case (name, f) =>
      try f(spark)
      catch { case scala.util.control.NonFatal(e) =>
        // non-fatal only: OOM/interrupt must propagate, not be reduced
        // to a log line with the JVM in a corrupted state
        System.err.println(
          s"[synopsis-stats] refresher $name failed for $dir: ${e.getMessage}")
      }
    })

  /** Per-(fact, dimension) calibrations seen so far, keyed by
    * (dimTable, keyColumn) then fact name — the fix for the r11
    * last-calibration-wins defect: a dimension joined against TWO facts
    * used to keep only the second fact's rows_eff, so the first fact's
    * reorder decision was made from the wrong number (the NORMAL star
    * shape at scale — one shared dimension, many facts). Each
    * [[injectCalibrated]] call records its (fact → rows_eff) entry and
    * injects the MAX across all facts recorded for that dimension: the
    * hot-aligned pair keeps its exact calibration, every other pair
    * gets a conservative OVER-estimate (never an under-estimate — the
    * direction that wrongly promotes a join to "cheap" and schedules it
    * first). Re-calibrating the same fact REPLACES its entry (refresh
    * semantics). JVM-global like [[SynopsisCatalog]]; [[clearCalibrations]]
    * resets (tests / corpus switch). */
  private val calibrations =
    new java.util.concurrent.ConcurrentHashMap[(String, String), Map[String, Long]]()

  def clearCalibrations(): Unit = calibrations.clear()

  /** Drop every recorded calibration for one (dimTable, keyColumn) —
    * the start-of-epoch reset an injector fires before re-calibrating
    * a dimension whose corpus CHANGED. Without it a fact that stops
    * being calibrated (vanished type after a corpus mutation, a
    * consumer that no longer runs) leaves its stale rows_eff in the
    * MAX forever: conservative direction, but unbounded staleness. An
    * injector that re-calibrates ALL of a dimension's facts in one
    * pass (the [[graft.operators.StatsJoin]] shape) resets first, so
    * the accumulated MAX reflects exactly the live fact set. */
  def resetCalibration(dimTable: String, keyColumn: String): Unit = {
    calibrations.remove((dimTable, keyColumn))
    ()
  }

  /** Frequency-skew calibration for a dimension joined against a fact
    * (see object doc): the dimension's injected cardinality is scaled
    * so Spark's uniform join formula yields [[JoinSynopsis.joinEst]]
    * for this (fact, dim) pair. Key NDV and bounds stay the honest
    * synopsis values — only the row count carries the skew signal.
    * Calibrations against DIFFERENT facts accumulate and the injected
    * rows_eff is their max (see [[calibrations]]); SynopsisStatsSpec's
    * two-fact case pins both directions. */
  def injectCalibrated(spark: SparkSession, dimTable: String,
      dimSyn: KeySynopsis, keyColumn: String, factSyn: KeySynopsis,
      avgRowBytes: Long = 32L,
      extraCols: Map[String, CatalogColumnStat] = Map.empty): Unit = {
    val est = JoinSynopsis.joinEst(factSyn, dimSyn)
    val maxNdv = math.max(factSyn.distinctEst, dimSyn.distinctEst)
    val effRows = math.max(1L, math.round(est * maxNdv / factSyn.rows.toDouble))
    val key = (dimTable, keyColumn)
    val merged = calibrations.merge(key, Map(factSyn.name -> effRows),
      (old, add) => old ++ add)
    val injRows = merged.values.max
    // extraCols ride a CALIBRATED rowCount, but Catalyst reads each
    // column's null fraction as nullCount/rowCount against it (the
    // physical-rows contract on [[inject]]) — rescale the nullCounts so
    // the FRACTION survives calibration; a physical nullCount over an
    // effective rowCount would put the fraction anywhere up to >1 and
    // corrupt every downstream FilterEstimation selectivity
    val phys = math.max(1L, dimSyn.rows).toDouble
    val scaledExtra = extraCols.map { case (c, st) =>
      c -> st.copy(nullCount = st.nullCount.map(nc =>
        BigInt(math.round(nc.toDouble / phys * injRows))))
    }
    // calibrated rowCount = conservative max across facts,
    // HONEST sizeInBytes (see inject)
    inject(spark, dimTable, injRows, Map(keyColumn -> dimSyn),
      avgRowBytes = avgRowBytes, physicalRows = Some(dimSyn.rows),
      extraCols = scaledExtra)
  }
}
