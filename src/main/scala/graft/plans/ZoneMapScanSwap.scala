package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.catalog.CatalogTable
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation,
  LogicalRelation}

import graft.operators.{ZIndex, ZTable}

/** The z-layout's CATALOG face: plain SQL over an ordinary external
  * parquet table gets zone-map file skipping, with no graft API in the
  * query.
  *
  * [[graft.operators.ZCatalog.ensureRegistered]] creates the external
  * table (explicit schema, location = the layout root) and registers
  * it here; this optimizer rule then swaps every scan of a registered
  * table onto a [[ZoneMapFileIndex]] over the layout's CURRENT
  * committed generation — the same SparkSessionExtensions injection
  * shape as [[RadiusJoinRewrite]] (and, like it, also reachable via
  * `spark.experimental.extraOptimizations` in plain sessions). The
  * swap replaces only the relation's FileIndex: output attributes,
  * schema, and format are untouched, so the plan is semantically
  * identical and FileSourceStrategy hands the pushed data filters to
  * the index's `listFiles` for per-file refutation.
  *
  * The SOURCE OF TRUTH is the table's own metadata, not this JVM's
  * registry (r14 verdict #1): `ensureRegistered` stamps the table with
  * `graft.zindex.dir` / `graft.zindex.root` / `graft.zindex.contract`
  * TBLPROPERTIES, and a session that never called the registration —
  * a fresh session over a persistent metastore, a peer JVM sharing the
  * catalog — RE-ARMS from those properties alone ([[resolve]]): the
  * contract name binds to a statically-registered [[ZTable]] factory
  * (built-ins register in this object; [[graft.weather.WeatherZServe]]
  * registers the gold contracts), the recorded root pins the layout
  * independent of any session conf, and the in-memory registry becomes
  * a CACHE. A propertied table whose contract this build does not know
  * fails LOUDLY (the `statsCustDim` require discipline) — its location
  * holds generation directories a flat listing would misread, so
  * silently not swapping would be a wrong-answer path, not a fallback.
  *
  * Registrations are keyed by the QUALIFIED identifier (database +
  * table, r14 ADVICE): a same-named table in another database is a
  * different key and is never swapped onto this layout.
  *
  * Each query plans against the layout generation committed at ITS
  * optimization time (resolution is stamp-memoized — one feed
  * listStatus steady-state), which is exactly the catalog-table
  * freshness contract the sketch tables follow. */
object ZoneMapScanSwap extends Rule[LogicalPlan] {

  /** TBLPROPERTIES keys — the durable registration record. */
  private[graft] val PropDir = "graft.zindex.dir"
  private[graft] val PropRoot = "graft.zindex.root"
  private[graft] val PropContract = "graft.zindex.contract"

  /** lower-cased "db.table" → (corpus dir, layout contract) — a CACHE
    * over the TBLPROPERTIES record, warmed at registration or on first
    * resolve. */
  private val registry = new ConcurrentHashMap[String, (String, ZTable)]()

  /** contract name → [[ZTable]] factory: the static half of
    * metadata-driven re-arming. A factory must be pure w.r.t. the
    * (session, corpus dir) pair — anything stamp- or path-derived
    * happens inside the ZTable's own feed/load functions. */
  private val contracts =
    new ConcurrentHashMap[String, (SparkSession, String) => ZTable]()

  def registerContract(name: String,
      f: (SparkSession, String) => ZTable): Unit = { contracts.put(name, f); () }

  // built-in contracts of this package (weather gold contracts register
  // from graft.weather.WeatherZServe's initializer)
  registerContract("lineitem", (_, _) => ZIndex.Lineitem)
  registerContract("lineitem_dec", (_, _) => ZIndex.LineitemDec)

  /** Qualified registry key for a catalog table. */
  private[graft] def keyOf(ct: CatalogTable): String =
    (ct.identifier.database.getOrElse("default") + "." +
      ct.identifier.table).toLowerCase

  private[graft] def register(ct: CatalogTable, dir: String,
      t: ZTable): Unit = { registry.put(keyOf(ct), (dir, t)); () }

  /** The layout behind a catalog table: the registry cache, else the
    * table's own TBLPROPERTIES ([[arm]]). None for tables that carry
    * neither — ordinary tables pass through untouched. */
  private[graft] def resolve(ct: CatalogTable): Option[(String, ZTable)] =
    Option(registry.get(keyOf(ct))).orElse(arm(ct))

  private def arm(ct: CatalogTable): Option[(String, ZTable)] =
    for {
      dir <- ct.properties.get(PropDir)
      name <- ct.properties.get(PropContract)
    } yield {
      val f = contracts.get(name)
      require(f != null,
        s"table ${ct.identifier} declares z-layout contract '$name' in " +
          s"TBLPROPERTIES but this build registers no such contract — " +
          s"refusing to scan raw generation directories")
      val base = f(SparkSession.active, dir)
      // the recorded root pins the layout location independent of any
      // session conf the registering session happened to carry
      val t = ct.properties.get(PropRoot)
        .map(r => base.copy(rootOverride = Some(r))).getOrElse(base)
      val entry = (dir, t)
      registry.put(keyOf(ct), entry)
      entry
    }

  private[graft] def isEmpty: Boolean = registry.isEmpty

  /** Spec/test hygiene: drop every cached registration (tables re-arm
    * from their own properties on the next scan). */
  def clear(): Unit = registry.clear()

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transform {
      case lr: LogicalRelation if lr.catalogTable.isDefined &&
          resolve(lr.catalogTable.get).isDefined =>
        lr.relation match {
          case fs: HadoopFsRelation
              if !fs.location.isInstanceOf[ZoneMapFileIndex] =>
            val (dir, t) = resolve(lr.catalogTable.get).get
            val spark = SparkSession.active
            val index = new ZoneMapFileIndex(
              fs.location.rootPaths.headOption.getOrElse(
                new org.apache.hadoop.fs.Path(dir)),
              () => ZIndex.resolveEntries(spark, dir, t))
            lr.copy(relation = fs.copy(location = index)(
              spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]))
          case _ => lr
        }
    }
}
