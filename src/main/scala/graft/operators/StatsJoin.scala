package graft.operators

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.plans.{JoinSynopsis, SynopsisStats, ValueSynopsis}
import graft.sources.Tables

/** q169 — a DECLARED query whose PLAN comes from the statistics
  * catalog, end-to-end (r11 verdict #1): Catalyst's own cost-based
  * join reorder, fed exclusively by table-served synopsis statistics
  * ([[graft.plans.JoinSynopsis.fromTable]] → calibrated rowCounts,
  * [[graft.plans.ValueSynopsis.fromTable]] → value histograms), plans
  * a 3-way join over the events corpus. ANALYZE never runs; no graft
  * planner rule is involved — the statistics the engine maintains
  * incrementally in its sketch table ARE the planner's inputs.
  *
  * This closes, Catalyst-owned, the reference's one manual
  * optimization (`aggregation.py:1-8` — "KEY FIX: start with data,
  * not postal codes", i.e. schedule the SELECTIVE side first instead
  * of the order the SQL happens to spell): the query below is WRITTEN
  * in the bad order (the two big unfiltered types join first; the
  * 98%-selective purchase filter joins last), and the injected
  * statistics chain — exact rowCount + join-key NDV/bounds +
  * calibrated effective cardinality + the value histogram driving
  * FilterEstimation — lets CostBasedJoinReorder schedule the filtered
  * purchase side first. Stats off (`spark.graft.stats.cbo=false`,
  * the RunOne A/B knob), the literal order stands and the plan pays
  * the |view ⋈ click| intermediate (~100x the good order's, every
  * scale — sf10 numbers in PLANS). StatsJoinCboSpec pins the executed
  * join order against [[JoinSynopsis.cheapestJoinFirst]]'s rank-1
  * schedule, fixture and sf10.
  *
  * The per-type TABLES are a durable layout of the corpus
  * (`pt=<type>/` parquet, the partition-by-type layout any production
  * events pipeline lands anyway), stamped with the feed's file
  * identity ([[KmvTable.feedStamp]]) and rebuilt only when the corpus
  * changes — registered as external catalog tables because catalog
  * statistics attach to catalog tables (that is where ANALYZE writes).
  * At 100 TB: the layout is one map-only repartition of the feed paid
  * once per corpus (the analogue of the maintenance scan), the
  * statistics injection is KB-sized driver metadata, and the query
  * itself ships with whatever join order the statistics justify —
  * which is the whole point.
  */
object StatsJoin {

  /** Typed-layout rebuilds in this JVM (spec observable: a fresh-stamp
    * call must not rebuild). */
  private[graft] val layoutBuilds = new AtomicLong

  /** `spark.graft.stats.cbo` (default on): the A/B knob for the
    * measured stats-on vs stats-off delta — off, q169 neither injects
    * statistics nor enables CBO, so the literal (bad) join order runs. */
  private[graft] def statsCboOn(spark: SparkSession): Boolean =
    !spark.conf.getOption("spark.graft.stats.cbo").contains("false")

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def layoutRoot(spark: SparkSession, dir: String): String =
    spark.conf.getOption("spark.graft.evlayout.dir")
      .getOrElse(sys.props("java.io.tmpdir") + s"/graft_ev_layout/${md5hex(dir)}")

  /** Materialize the per-type layout of the events feed (user-keyed
    * join columns only: user_id, d, v-cents; null-user rows dropped —
    * they can never satisfy the equi-join) under a feed-stamped root;
    * returns the data root containing `pt=<type>/` dirs. Stamp written
    * AFTER the data (the commit marker): a crash mid-write leaves a
    * stampless dir that the next call rebuilds. */
  def ensureTypedLayout(spark: SparkSession, dir: String): String = synchronized {
    val root = layoutRoot(spark, dir)
    val rp = new org.apache.hadoop.fs.Path(root)
    val fs = rp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stamp = KmvTable.feedStamp(spark, dir)
    val stampPath = new org.apache.hadoop.fs.Path(s"$root/_stamp")
    if (fs.exists(stampPath)) {
      val in = fs.open(stampPath)
      val cur = try new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
      finally in.close()
      if (cur == stamp) return s"$root/data"
    }
    layoutBuilds.incrementAndGet()
    if (fs.exists(rp)) { fs.delete(rp, true); () }
    Tables.events(spark, dir)
      .filter(col("user_id").isNotNull)
      .select(col("event_type").as("pt"), col("user_id"),
        to_date(col("ts")).as("d"),
        when(col("value").isNotNull,
          (col("value").cast("decimal(18,2)") * lit(100)).cast("long")).as("v"))
      .write.partitionBy("pt").parquet(s"$root/data")
    val out = fs.create(stampPath, false)
    try out.write(stamp.getBytes("UTF-8")) finally out.close()
    s"$root/data"
  }

  /** Register one external catalog table per event type over the
    * layout (idempotent; refreshed every call so a rebuilt layout is
    * never read through a stale cached relation). Returns
    * type → table name; names carry a corpus-dir hash so the three
    * gate scales coexist in one session catalog. */
  def registerTypedTables(spark: SparkSession, dir: String): Map[String, String] = {
    val dataRoot = ensureTypedLayout(spark, dir)
    val fs = new org.apache.hadoop.fs.Path(dataRoot)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val id8 = md5hex(dir).take(8)
    def esc(v: String): String =
      org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName(v)
    def unesc(v: String): String =
      org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.unescapePathName(v)
    fs.listStatus(new org.apache.hadoop.fs.Path(dataRoot)).toSeq
      .collect { case s if s.isDirectory && s.getPath.getName.startsWith("pt=") =>
        unesc(s.getPath.getName.stripPrefix("pt=")) }
      .sorted.map { t =>
        val safe = t.map(ch => if (ch.isLetterOrDigit) ch else '_')
        val tbl = s"graft_ev_${safe}_$id8"
        spark.sql(
          s"""CREATE TABLE IF NOT EXISTS $tbl (user_id BIGINT, d DATE, v BIGINT)
             |USING parquet LOCATION '$dataRoot/pt=${esc(t)}'""".stripMargin)
        spark.catalog.refreshTable(tbl)
        t -> tbl
      }.toMap
  }

  /** value >= 200.00 — ~1.6% of purchase rows at every gate scale:
    * selective enough that the filtered side is the provably cheap
    * first join, populated enough that sf0.001 still returns rows. */
  private[graft] val ThresholdCents = 20000L

  /** The query text — deliberately the BAD literal order (see object
    * doc): the two unfiltered types first, the filtered type last. */
  private[graft] def q169Query(vT: String, cT: String, pT: String): String =
    s"""SELECT v.d AS d, COUNT(*) AS n_rows,
       |  COUNT(DISTINCT v.user_id) AS n_users,
       |  SUM(c.v) AS sum_click_cents
       |FROM $vT v
       |JOIN $cT c ON v.user_id = c.user_id
       |JOIN $pT p ON v.user_id = p.user_id
       |WHERE p.v >= $ThresholdCents
       |GROUP BY v.d
       |ORDER BY d""".stripMargin

  /** Inject every statistic the plan needs for `table`, all served
    * from the maintained sketch table: exact rowCount (= the key
    * population — the layout is the user-non-null frame), join-key
    * NDV + domain bounds, the value histogram (FilterEstimation's
    * input), and for dimensions the calibrated effective cardinality
    * against the fact. */
  private def injectFor(spark: SparkSession, table: String,
      syn: graft.plans.KeySynopsis, vs: Option[ValueSynopsis],
      factSyn: Option[graft.plans.KeySynopsis]): Unit = {
    val rowBytes = 24L // user_id + d + v
    val extra = vs.map { v =>
      // the layout's v column is null exactly where value was null;
      // its population differs from the synopsis's (value ∧ event_id
      // non-null) only by degenerate rows — a statistics-grade bound
      Map("v" -> SynopsisStats.valueStat(v).copy(
        nullCount = Some(BigInt(math.max(0L, syn.rows - v.rows)))))
    }.getOrElse(Map.empty)
    factSyn match {
      case Some(f) => SynopsisStats.injectCalibrated(
        spark, table, syn, "user_id", f, avgRowBytes = rowBytes,
        extraCols = extra)
      case None => SynopsisStats.inject(
        spark, table, syn.rows, Map("user_id" -> syn),
        avgRowBytes = rowBytes, extraCols = extra)
    }
  }

  /** Rebuild-if-stale the layout + tables and (re-)inject every
    * statistic q169's plan consumes — the unit of work
    * [[graft.plans.SynopsisStats.registerRefresh]] re-fires after each
    * maintenance commit, so an appended corpus updates BOTH the layout
    * and the catalog statistics in the maintenance call itself (zero
    * stale window beyond the run). Returns type → table name. */
  private def injectAll(spark: SparkSession, dir: String): Map[String, String] = {
    val tbls = registerTypedTables(spark, dir)
    require(Seq("view", "click", "purchase").forall(tbls.contains),
      s"corpus lacks the q169 event types: ${tbls.keys.toSeq.sorted}")
    val keySyns = JoinSynopsis.fromTable(spark, dir)
    val valSyns = ValueSynopsis.fromTable(spark, dir)
    injectFor(spark, tbls("view"), keySyns("view"), valSyns.get("view"), None)
    injectFor(spark, tbls("click"), keySyns("click"), valSyns.get("click"),
      Some(keySyns("view")))
    injectFor(spark, tbls("purchase"), keySyns("purchase"),
      valSyns.get("purchase"), Some(keySyns("view")))
    tbls
  }

  /** q169 — see object doc. Stats-on (default) this builds the
    * per-type synopses FROM THE MAINTAINED TABLE, writes them as
    * catalog statistics, registers the injection for post-maintenance
    * refresh, and runs the query in a child session with CBO + join
    * reorder enabled (child session: the conf flip never leaks into
    * the caller's session, and the gate's other queries keep their
    * vanilla planner). Stats-off it runs the identical SQL with no
    * statistics and no CBO — the literal-order baseline. */
  def q169StatsJoinOrder(spark: SparkSession, dir: String): DataFrame = {
    val tbls =
      if (statsCboOn(spark)) {
        val t = injectAll(spark, dir)
        SynopsisStats.registerRefresh(dir, "q169_stats") { sp =>
          injectAll(sp, dir); ()
        }
        t
      } else registerTypedTables(spark, dir)
    require(Seq("view", "click", "purchase").forall(tbls.contains),
      s"corpus lacks the q169 event types: ${tbls.keys.toSeq.sorted}")
    val (vT, cT, pT) = (tbls("view"), tbls("click"), tbls("purchase"))
    val s = spark.newSession()
    if (statsCboOn(spark)) {
      s.conf.set("spark.sql.cbo.enabled", "true")
      s.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    }
    // the child session resolves the tables through its own relation
    // cache — refresh so it sees this call's layout + statistics
    Seq(vT, cT, pT).foreach(t => s.catalog.refreshTable(t))
    s.sql(q169Query(vT, cT, pT))
  }

  /** DuckDB oracle: the identical 3-way join computed straight off the
    * raw feed (the layout is a projection of it — same `CAST(ts AS
    * DATE)` day, same exact-cents transform as the whole q159+ family). */
  val q169Sql: String =
    s"""WITH ev AS (
       |  SELECT event_type, user_id, CAST(ts AS DATE) AS d,
       |    CASE WHEN value IS NOT NULL
       |      THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) END AS v
       |  FROM events WHERE user_id IS NOT NULL)
       |SELECT v.d AS d, CAST(COUNT(*) AS BIGINT) AS n_rows,
       |  CAST(COUNT(DISTINCT v.user_id) AS BIGINT) AS n_users,
       |  CAST(SUM(c.v) AS BIGINT) AS sum_click_cents
       |FROM (SELECT * FROM ev WHERE event_type = 'view') v
       |JOIN (SELECT * FROM ev WHERE event_type = 'click') c
       |  ON v.user_id = c.user_id
       |JOIN (SELECT * FROM ev WHERE event_type = 'purchase') p
       |  ON v.user_id = p.user_id
       |WHERE p.v >= $ThresholdCents
       |GROUP BY v.d ORDER BY d""".stripMargin
}
