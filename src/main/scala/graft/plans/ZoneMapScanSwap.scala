package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession
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
  * Each query plans against the layout generation committed at ITS
  * optimization time (resolution is stamp-memoized — one feed
  * listStatus steady-state), which is exactly the catalog-table
  * freshness contract the sketch tables follow. */
object ZoneMapScanSwap extends Rule[LogicalPlan] {

  /** lower-cased table name → (corpus dir, layout contract). */
  private val registry = new ConcurrentHashMap[String, (String, ZTable)]()

  private[graft] def register(table: String, dir: String, t: ZTable): Unit =
    registry.put(table.toLowerCase, (dir, t))

  private[graft] def lookup(table: String): Option[(String, ZTable)] =
    Option(registry.get(table.toLowerCase))

  private[graft] def isEmpty: Boolean = registry.isEmpty

  /** Spec/test hygiene: drop every registration. */
  def clear(): Unit = registry.clear()

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (registry.isEmpty) return plan
    plan.transform {
      case lr: LogicalRelation if lr.catalogTable.exists(ct =>
          registry.containsKey(ct.identifier.table.toLowerCase)) =>
        lr.relation match {
          case fs: HadoopFsRelation
              if !fs.location.isInstanceOf[ZoneMapFileIndex] =>
            val (dir, t) = registry.get(
              lr.catalogTable.get.identifier.table.toLowerCase)
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
}
