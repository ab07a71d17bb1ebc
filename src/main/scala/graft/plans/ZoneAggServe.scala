package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute,
  AttributeReference, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression,
  Complete, Count, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation,
  LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** METADATA-ONLY aggregate serving off the zone map: an un-grouped,
  * un-filtered `MIN` / `MAX` / `COUNT` over a
  * [[graft.operators.ZCatalog]]-registered table is answered from the
  * per-file footer statistics the layout already maintains — ZERO
  * tasks, zero file opens, a KB driver consult folded into a
  * [[LocalRelation]] at optimization time.
  *
  * This is Spark's own `OptimizeMetadataOnlyQuery` (partition-column
  * aggregates from the catalog) extended to DATA columns, exactly the
  * way Delta answers `SELECT COUNT(*)` from its transaction log: the
  * zone map's bounds are EXACT per file over the non-null population
  * (MIN/MAX ignore nulls — same semantics), `np` row counts are exact,
  * and null counts make `COUNT(col)` exact when the footers carried
  * them. Anything the map cannot answer EXACTLY — a stats-less
  * (keep-all) file under a MIN/MAX, an unknown null count under a
  * COUNT(col), a DISTINCT, a FILTER clause, a WHERE between the
  * aggregate and the scan, a grouped aggregate — leaves the plan
  * untouched and the ordinary pruned scan runs. Conservative exactness
  * first: the rewrite changes the PLAN, never the answer
  * (ZoneAggServeSpec pins result equality against the raw table and
  * the absence of any file scan in the served plan). */
object ZoneAggServe extends Rule[LogicalPlan] {

  /** The registered z-relation beneath an optional column-pruning
    * Project: (corpus dir, table contract). */
  private def zChild(plan: LogicalPlan)
      : Option[(String, graft.operators.ZTable)] = plan match {
    case Project(projectList, child) if projectList.forall(
        _.isInstanceOf[AttributeReference]) => zChild(child)
    case lr: LogicalRelation =>
      lr.catalogTable.flatMap(ct =>
        ZoneMapScanSwap.lookup(ct.identifier.table))
    case _ => None
  }

  /** The internal-row literal value of a zone bound for the attribute's
    * Catalyst type; None = this zone cannot serve that type exactly. */
  private def internal(v: Any, dt: DataType): Option[Any] = (v, dt) match {
    case (l: Long, LongType) => Some(l)
    case (l: Long, IntegerType) => Some(l.toInt)
    case (l: Long, ShortType) => Some(l.toShort)
    case (l: Long, ByteType) => Some(l.toByte)
    case (l: Long, DateType) => Some(l.toInt)
    case (l: Long, TimestampType | TimestampNTZType) => Some(l)
    case (d: Double, DoubleType) => Some(d)
    case (d: Double, FloatType) => Some(d.toFloat)
    case (s: String, StringType) => Some(UTF8String.fromString(s))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (ZoneMapScanSwap.isEmpty) return plan
    plan.transform {
      case agg: Aggregate if agg.groupingExpressions.isEmpty &&
          agg.aggregateExpressions.nonEmpty &&
          zChild(agg.child).isDefined =>
        val aggExprs: Seq[NamedExpression] = agg.aggregateExpressions
        val (dir, t) = zChild(agg.child).get
        val spark = SparkSession.active
        val entries =
          graft.operators.ZIndex.resolveEntries(spark, dir, t)
        def zonesOf(a: Attribute): Option[Seq[ColZone]] = {
          val zs = entries.map(_.cols.get(a.name.toLowerCase))
          if (zs.exists(z => z.isEmpty || z.contains(KeepAllZone))) None
          else Some(zs.flatten)
        }
        def bound(a: Attribute, mn: Boolean): Option[Any] =
          zonesOf(a).flatMap { zs =>
            val longs = zs.collect { case LongZone(lo, hi, _) =>
              if (mn) lo else hi }
            val dbls = zs.collect { case DoubleZone(lo, hi, _) =>
              if (mn) lo else hi }
            val strs = zs.collect { case StringZone(lo, hi, _) =>
              if (mn) lo else hi }
            val v: Option[Any] =
              if (longs.nonEmpty) Some(if (mn) longs.min else longs.max)
              else if (dbls.nonEmpty) Some(if (mn) dbls.min else dbls.max)
              else if (strs.nonEmpty) Some(if (mn) strs.min else strs.max)
              else None // every file all-null: the aggregate is NULL
            v match {
              case None => Some(null) // exact: MIN/MAX of all-NULL
              case Some(x) => internal(x, a.dataType)
            }
          }
        // every output expression must be servable EXACTLY, else bail
        val served: Option[Seq[Any]] = {
          val vals = aggExprs.map {
            case Alias(AggregateExpression(f, Complete, false, None, _),
                _) => f match {
              case Min(a: Attribute) => bound(a, mn = true)
              case Max(a: Attribute) => bound(a, mn = false)
              case Count(Seq(Literal(_, _))) =>
                Some(entries.map(_.rows).sum): Option[Any]
              case Count(Seq(a: Attribute)) => zonesOf(a).flatMap { _ =>
                // per file: all-null → 0 non-null rows exactly; a typed
                // zone needs its EXACT null count (-1 = unknown → bail)
                val perFile = entries.map(e =>
                  e.cols(a.name.toLowerCase) match {
                    case AllNullZone => 0L
                    case LongZone(_, _, n) => if (n < 0) -1L else e.rows - n
                    case DoubleZone(_, _, n) => if (n < 0) -1L else e.rows - n
                    case StringZone(_, _, n) => if (n < 0) -1L else e.rows - n
                    case KeepAllZone => -1L
                  })
                if (perFile.exists(_ < 0)) None
                else Some(perFile.sum): Option[Any]
              }
              case _ => None
            }
            case _ => None
          }
          if (vals.forall(_.isDefined)) Some(vals.map(_.get)) else None
        }
        served match {
          case Some(row) =>
            ZoneAggServe.servedCount.incrementAndGet()
            LocalRelation(agg.output, Seq(InternalRow.fromSeq(row)))
          case None => agg
        }
    }
  }

  /** Spec observable: metadata-only rewrites applied in this JVM. */
  private[graft] val servedCount =
    new java.util.concurrent.atomic.AtomicLong
}
