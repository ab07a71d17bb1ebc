package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.plans.ZoneMapScanSwap

/** q176 — the z-layout behind a PLAIN SQL catalog table: the round-13
  * FileIndex integration (q175) made any DataFrame predicate skip
  * files; this face makes an unmodified SQL consumer — `SELECT … FROM
  * <table> WHERE …`, no graft API anywhere in the query — get the same
  * skipping, the way the reference's users query their B-tree-indexed
  * tables through ordinary SQL (`sql/schema.sql:278-305`).
  *
  * [[ensureRegistered]] lands the durable layout ([[ZIndex.ensure]]),
  * creates an external parquet table over the layout root with the
  * corpus's explicit schema (pure metadata — no listing, no scan), and
  * registers it with [[graft.plans.ZoneMapScanSwap]], which swaps the
  * table's scans onto the zone-mapped FileIndex at optimization time.
  * Without the rule the table face is inert metadata (its root holds
  * only generation directories, which a flat listing ignores) — the
  * face REQUIRES the graft planner injection, exactly like the
  * radius-join rewrite; with it, any predicate over any recorded
  * column prunes files before a single task launches.
  *
  * At 100 TB this is the operational shape: the layout is maintained
  * once (appends are O(delta)), every ad-hoc SQL consumer shares the
  * pruning, and the zone map never leaves the driver. */
object ZCatalog {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Catalog table name for a corpus's z-layout (spec surface) — the
    * per-corpus id8 suffix follows the stats-catalog convention. */
  private[graft] def zTableName(dir: String, t: ZTable): String =
    s"graft_z_${t.name}_${md5hex(dir).take(8)}"

  /** Land the layout, create the catalog table, arm the scan-swap rule
    * (idempotent; plain sessions get it via extraOptimizations, the
    * extensions path injects it once for the whole session). Returns
    * the table name. */
  def ensureRegistered(spark: SparkSession, dir: String,
      t: ZTable = ZIndex.Lineitem): String = {
    val (root, _) = ZIndex.ensure(spark, dir, t)
    val tbl = zTableName(dir, t)
    ZoneMapScanSwap.register(tbl, dir, t)
    if (!spark.experimental.extraOptimizations.contains(ZoneMapScanSwap))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ ZoneMapScanSwap
    if (!spark.experimental.extraOptimizations.contains(
        graft.plans.ZoneAggServe))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.ZoneAggServe
    // a table created under an OLDER layout-root conf points at a
    // superseded location: re-point by drop + create (metadata only —
    // the WeatherStats.ensureTable discipline). The location only
    // matters to rule-less readers; the swap rule resolves the live
    // root either way.
    def normalize(p: Any): String =
      new org.apache.hadoop.fs.Path(p.toString).toUri.getPath
        .stripSuffix("/")
    if (spark.catalog.tableExists(tbl) &&
        normalize(spark.sessionState.catalog.getTableMetadata(
          org.apache.spark.sql.catalyst.TableIdentifier(tbl)).location)
          != normalize(root))
      spark.sql(s"DROP TABLE $tbl")
    if (!spark.catalog.tableExists(tbl)) {
      val ddl = t.load(spark, dir).schema.toDDL
      spark.sql(s"CREATE TABLE IF NOT EXISTS $tbl ($ddl) " +
        s"USING parquet LOCATION '$root'")
    }
    tbl
  }

  /** q176 — the declared plain-SQL consumer: a BETWEEN band on the
    * non-leading clustered dimension, a range on the leading one, and
    * an IN list over a string zone column, all spelled as ordinary SQL
    * against the catalog table. The literals derive from the zone
    * map's own global bounds (the q172 arithmetic — decile cuts whose
    * DuckDB `//` twin is exact), inlined into the SQL text: the QUERY
    * is what a reference user would type; the harness only computed
    * the cut points. Executed-plan pin: ZCatalogSpec asserts the
    * scan's FileIndex is the zone map and its kept set equals the
    * driver-side consult of the same entries. */
  def q176ZorderSql(spark: SparkSession, dir: String): DataFrame = {
    val entries = ZIndex.resolveEntries(spark, dir, ZIndex.Lineitem)
    val (plo, phi) = ZIndex.globalLong(spark, dir, ZIndex.Lineitem,
      entries, "l_partkey")
    val (olo, ohi) = ZIndex.globalLong(spark, dir, ZIndex.Lineitem,
      entries, "l_orderkey")
    val xmid = plo + (phi - plo) * 6 / 10
    val ylo = olo + (ohi - olo) * 3 / 10
    val yhi = olo + (ohi - olo) * 4 / 10
    val tbl = ensureRegistered(spark, dir)
    spark.sql(
      s"""SELECT l_returnflag, COUNT(*) AS n_rows,
         |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         |  COUNT(DISTINCT l_suppkey) AS n_supp
         |FROM $tbl
         |WHERE l_orderkey BETWEEN $ylo AND $yhi
         |  AND l_partkey < $xmid
         |  AND l_returnflag IN ('A', 'R')
         |GROUP BY l_returnflag
         |ORDER BY l_returnflag""".stripMargin)
  }

  /** q178 — METADATA-ONLY aggregates: un-grouped MIN/MAX/COUNT over
    * the catalog table, answered entirely from the zone map by
    * [[graft.plans.ZoneAggServe]] — zero tasks, zero file opens, the
    * reference's `SELECT MIN(..), MAX(..), COUNT(*)` warehouse
    * heartbeat served the way Delta serves COUNT(*) from its log.
    * Exactness-guarded: any file without usable footer stats for a
    * referenced column leaves the plan untouched and the pruned scan
    * runs instead (the answer never moves — ZoneAggServeSpec pins the
    * served plan containing NO file scan AND result equality).
    * Timestamp columns deliberately stay out of the DECLARED query
    * (cross-engine timestamp rendering is pinned elsewhere); the spec
    * covers a timestamp MIN in-JVM. */
  def q178ZonemapAgg(spark: SparkSession, dir: String): DataFrame = {
    val tbl = ensureRegistered(spark, dir)
    spark.sql(
      s"""SELECT MIN(l_partkey) AS min_pk, MAX(l_partkey) AS max_pk,
         |  MIN(l_orderkey) AS min_ok, MAX(l_orderkey) AS max_ok,
         |  MIN(l_returnflag) AS min_flag, MAX(l_returnflag) AS max_flag,
         |  COUNT(*) AS n_rows, COUNT(l_partkey) AS n_pk
         |FROM $tbl""".stripMargin)
  }

  /** DuckDB oracle for [[q178ZonemapAgg]]: the same aggregates off the
    * raw table. */
  val q178Sql: String =
    """SELECT MIN(l_partkey) AS min_pk, MAX(l_partkey) AS max_pk,
      |  MIN(l_orderkey) AS min_ok, MAX(l_orderkey) AS max_ok,
      |  MIN(l_returnflag) AS min_flag, MAX(l_returnflag) AS max_flag,
      |  CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(COUNT(l_partkey) AS BIGINT) AS n_pk
      |FROM lineitem""".stripMargin

  /** DuckDB oracle: identical decile arithmetic (`//` == Long
    * truncation on these non-negative ranges) straight off the raw
    * table. */
  val q176Sql: String =
    """WITH b AS (
      |  SELECT MIN(l_partkey) AS plo, MAX(l_partkey) AS phi,
      |         MIN(l_orderkey) AS olo, MAX(l_orderkey) AS ohi
      |  FROM lineitem),
      |x AS (
      |  SELECT plo + (phi - plo) * 6 // 10 AS xmid,
      |         olo + (ohi - olo) * 3 // 10 AS ylo,
      |         olo + (ohi - olo) * 4 // 10 AS yhi
      |  FROM b)
      |SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supp
      |FROM lineitem, x
      |WHERE l_orderkey BETWEEN ylo AND yhi
      |  AND l_partkey < xmid
      |  AND l_returnflag IN ('A', 'R')
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin
}
