package graft.plans

import scala.util.control.NonFatal

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute,
  AttributeReference, Expression, ExprId, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression,
  AggregateFunction, Complete, Count, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation,
  LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** METADATA-ONLY aggregate serving off the zone map: a `MIN` / `MAX` /
  * `COUNT` aggregate over a [[graft.operators.ZCatalog]]-registered
  * table is answered from the per-file footer statistics the layout
  * already maintains — ZERO tasks, zero file opens, a KB driver
  * consult folded into a [[LocalRelation]] at optimization time.
  *
  * This is Spark's own `OptimizeMetadataOnlyQuery` (partition-column
  * aggregates from the catalog) extended to DATA columns, exactly the
  * way Delta answers `SELECT COUNT(*)` from its transaction log: the
  * zone map's bounds are EXACT per file over the non-null population
  * (MIN/MAX ignore nulls — same semantics), `np` row counts are exact,
  * and null counts make `COUNT(col)` exact when the footers carried
  * them. Two shapes serve:
  *
  *  - UN-GROUPED aggregates (q178/q179/q181): every output expression
  *    folds to a literal — including expressions AROUND the aggregate
  *    (`CAST(MIN(price) AS DOUBLE)`, arithmetic), which are evaluated
  *    on the driver after the aggregate value is substituted.
  *  - GROUP BY SINGLE-VALUED columns — one key (q182, r14 verdict #5)
  *    or a TUPLE of keys (q187, r15 verdict #3): when every file's
  *    zone on EVERY group key is a CONSTANT with zero nulls (or the
  *    file is all-null on it — the NULL group), the files partition
  *    exactly by the composite group and each group's aggregates fold
  *    from its own files — the per-type heartbeat over a
  *    type-clustered layout and the per-(type, day) rollup over a
  *    (type, day)-pure layout both become zero-task.
  *  - WHERE over SINGLE-VALUED columns (q183): a filter whose every
  *    referenced column is single-valued per file evaluates to the
  *    same verdict for every row of a file — each file is admitted or
  *    excluded WHOLE (exactly; a NULL predicate keeps no rows), and
  *    the aggregates fold over the admitted set. The per-type
  *    freshness probe (`WHERE data_type = 'observation'`) costs zero
  *    tasks.
  *
  * Anything the map cannot answer EXACTLY — a stats-less (keep-all)
  * file under a MIN/MAX, an unknown null count under a COUNT(col), a
  * DISTINCT, a FILTER clause, a WHERE touching any column that is not
  * single-valued per file, a group key with a non-constant zone or
  * unknown nulls — leaves the plan untouched and the ordinary pruned
  * scan runs.
  * Conservative exactness first: the rewrite changes the PLAN, never
  * the answer (ZoneAggServeSpec pins result equality against the raw
  * table and the absence of any file scan in the served plan). */
object ZoneAggServe extends Rule[LogicalPlan] {

  /** The registered z-relation beneath optional column-pruning
    * Projects and Filters: (corpus dir, table contract, filter
    * conjuncts bottom-up) — resolved through the
    * TBLPROPERTIES-or-registry path, same as the scan swap. Filters
    * are only SERVABLE when every referenced column's zone is
    * single-valued per file (see [[fileAdmits]]); collecting them here
    * lets the WHERE'd heartbeat (q183) fold too, with the same
    * bail-to-scan guarantee. */
  private def zChild(plan: LogicalPlan): Option[
      (String, graft.operators.ZTable, Seq[Expression])] = plan match {
    case Project(projectList, child) if projectList.forall(
        _.isInstanceOf[AttributeReference]) => zChild(child)
    case org.apache.spark.sql.catalyst.plans.logical.Filter(cond, child) =>
      zChild(child).map { case (d, t, cs) => (d, t, cs :+ cond) }
    case lr: LogicalRelation =>
      lr.catalogTable.flatMap(ZoneMapScanSwap.resolve)
        .map { case (d, t) => (d, t, Nil) }
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
    case (bd: java.math.BigDecimal, dt: DecimalType) =>
      val d = Decimal(bd)
      if (d.changePrecision(dt.precision, dt.scale)) Some(d) else None
    case _ => None
  }

  /** Zones of `a` across `entries`; None when any file lacks a usable
    * zone for it (keep-all) — the map cannot speak for that column. */
  private def zonesOf(a: Attribute, entries: Seq[ZoneFile])
      : Option[Seq[ColZone]] = {
    val zs = entries.map(_.cols.get(a.name.toLowerCase))
    if (zs.exists(z => z.isEmpty || z.contains(KeepAllZone))) None
    else Some(zs.flatten)
  }

  /** Exact MIN/MAX of `a` over `entries` as an internal-row value
    * (NULL when every file is all-null — the aggregate's own
    * semantics); None = not servable exactly. */
  private def bound(a: Attribute, mn: Boolean, entries: Seq[ZoneFile])
      : Option[Any] =
    zonesOf(a, entries).flatMap { zs =>
      val longs = zs.collect { case LongZone(lo, hi, _) =>
        if (mn) lo else hi }
      val dbls = zs.collect { case DoubleZone(lo, hi, _) =>
        if (mn) lo else hi }
      val strs = zs.collect { case StringZone(lo, hi, _) =>
        if (mn) lo else hi }
      val decs = zs.collect { case DecimalZone(lo, hi, _) =>
        if (mn) lo else hi }
      val v: Option[Any] =
        if (longs.nonEmpty) Some(if (mn) longs.min else longs.max)
        else if (dbls.nonEmpty) Some(if (mn) dbls.min else dbls.max)
        else if (strs.nonEmpty) Some(if (mn) strs.min else strs.max)
        else if (decs.nonEmpty) Some(decs.reduce((x, y) =>
          if ((x.compareTo(y) <= 0) == mn) x else y))
        else None // every file all-null: the aggregate is NULL
      v match {
        case None => Some(null) // exact: MIN/MAX of all-NULL
        case Some(x) => internal(x, a.dataType)
      }
    }

  /** The servable aggregate functions, evaluated over one group's
    * files: exact value as an internal-row literal, None = bail. */
  private def aggValue(f: AggregateFunction, entries: Seq[ZoneFile])
      : Option[Any] = f match {
    case Min(a: Attribute) => bound(a, mn = true, entries)
    case Max(a: Attribute) => bound(a, mn = false, entries)
    case Count(Seq(Literal(_, _))) =>
      Some(entries.map(_.rows).sum): Option[Any]
    case Count(Seq(a: Attribute)) => zonesOf(a, entries).flatMap { _ =>
      // per file: all-null → 0 non-null rows exactly; a typed zone
      // needs its EXACT null count (-1 = unknown → bail)
      val perFile = entries.map(e => e.cols(a.name.toLowerCase) match {
        case AllNullZone => 0L
        case LongZone(_, _, n) => if (n < 0) -1L else e.rows - n
        case DoubleZone(_, _, n) => if (n < 0) -1L else e.rows - n
        case StringZone(_, _, n) => if (n < 0) -1L else e.rows - n
        case DecimalZone(_, _, n) => if (n < 0) -1L else e.rows - n
        case KeepAllZone => -1L
      })
      if (perFile.exists(_ < 0)) None
      else Some(perFile.sum): Option[Any]
    }
    case _ => None
  }

  /** COUNT(DISTINCT col) over one group's files — exact when the
    * column is SINGLE-VALUED per file (constant with zero nulls, or
    * all-null): the distinct non-null constants are countable from
    * the zones alone (all-null files contribute nothing — DISTINCT
    * ignores nulls; files sharing a constant count once). Any
    * non-constant zone bails. */
  private def distinctCount(a: Attribute, entries: Seq[ZoneFile])
      : Option[Long] = {
    val consts = entries.map(e =>
      e.cols.get(a.name.toLowerCase).flatMap(constOf))
    if (consts.exists(_.isEmpty)) None
    else {
      val internals = consts.flatten
        .collect { case Some(raw) => internal(raw, a.dataType) }
      if (internals.exists(_.isEmpty)) None
      else Some(internals.flatten.distinct.size.toLong)
    }
  }

  /** One output expression folded to its served value for one group:
    * aggregates substitute their zone-derived literals (top-down, so
    * an aggregate's INPUT attributes stay intact for [[aggValue]]),
    * the group key substitutes its constant, and whatever expression
    * surrounds them (casts, arithmetic, alias) is evaluated on the
    * driver. None = some piece is not servable exactly. */
  private def servedValue(ne: NamedExpression, entries: Seq[ZoneFile],
      groupLit: Map[ExprId, Literal]): Option[Any] = {
    var ok = true
    val replaced = ne.transformDown {
      case ae @ AggregateExpression(f, Complete, false, None, _) =>
        aggValue(f, entries) match {
          case Some(v) => Literal(v, ae.dataType)
          case None => ok = false; ae
        }
      // COUNT(DISTINCT col) over a single-valued column (q188): the
      // single-distinct shape survives logical optimization intact
      // (RewriteDistinctAggregates only expands multi-distinct, which
      // lands on the catch-all bail below)
      case ae @ AggregateExpression(Count(Seq(a: Attribute)), Complete,
          true, None, _) =>
        distinctCount(a, entries) match {
          case Some(v) => Literal(v, ae.dataType)
          case None => ok = false; ae
        }
      case ae: AggregateExpression => ok = false; ae
      case a: AttributeReference if groupLit.contains(a.exprId) =>
        groupLit(a.exprId)
    }
    val body = replaced match {
      case Alias(c, _) => c
      case e => e
    }
    if (!ok || !body.deterministic ||
        body.exists(e => e.isInstanceOf[Attribute] ||
          e.isInstanceOf[AggregateExpression])) None
    else try Some(body.eval(InternalRow.empty))
    catch { case NonFatal(_) => None } // e.g. overflow in an outer cast
  }

  /** The group key's constant over one file's zone: None = not
    * single-valued (bail); Some(None) = the file's rows are ALL NULL
    * on the key (the NULL group); Some(Some(raw)) = every row carries
    * `raw`. Exactness needs nulls == 0 — a file mixing a constant with
    * NULLs would need a per-aggregate row split the map cannot do. */
  private def constOf(z: ColZone): Option[Option[Any]] = z match {
    case AllNullZone => Some(None)
    case LongZone(lo, hi, 0) if lo == hi => Some(Some(lo))
    // bit-exact compare (r15 ADVICE): a file mixing -0.0 and +0.0 has
    // footer (min -0.0, max 0.0) which primitive == calls equal — it
    // is NOT single-valued (a served group key of -0.0 vs Spark's
    // normalized 0.0 would split groups). Double.compare distinguishes
    // the zeros; the NaN guard keeps compare's NaN==NaN from claiming
    // a constant parquet stats never soundly record
    case DoubleZone(lo, hi, 0)
        if java.lang.Double.compare(lo, hi) == 0 && !lo.isNaN =>
      Some(Some(lo))
    case StringZone(lo, hi, 0) if lo == hi => Some(Some(lo))
    case DecimalZone(lo, hi, 0) if lo.compareTo(hi) == 0 => Some(Some(lo))
    case _ => None
  }

  /** Whether a filter conjunct ADMITS a file's rows, decided EXACTLY:
    * every referenced attribute must be single-valued in the file
    * (constant with zero nulls, or all-null → the attribute is NULL
    * for every row), so the predicate evaluates to the same value for
    * every row — substitute and eval on the driver. Some(true) = all
    * rows pass; Some(false) = none do (false OR null result — a null
    * predicate keeps no rows); None = not decidable → the whole
    * rewrite bails to the scan. */
  private def fileAdmits(cond: Expression, e: ZoneFile): Option[Boolean] = {
    var ok = true
    val replaced = cond.transformDown {
      case a: AttributeReference =>
        e.cols.get(a.name.toLowerCase).flatMap(constOf) match {
          case Some(None) => Literal(null, a.dataType)
          case Some(Some(raw)) => internal(raw, a.dataType) match {
            case Some(v) => Literal(v, a.dataType)
            case None => ok = false; a
          }
          case None => ok = false; a
        }
    }
    if (!ok || !replaced.deterministic ||
        replaced.exists(_.isInstanceOf[Attribute])) None
    // a THROWING predicate (ANSI division by zero in the WHERE) bails
    // the serve rather than surfacing the error here — deliberate
    // asymmetry: the scan this falls back to evaluates the same
    // predicate on the same rows and raises the error itself, so the
    // observable behavior is identical and the driver never turns an
    // executor-side error into a plan-time one (r15 verdict note)
    else try Some(replaced.eval(InternalRow.empty) == true)
    catch { case NonFatal(_) => None }
  }

  private def serve(agg: Aggregate, dir: String,
      t: graft.operators.ZTable,
      filters: Seq[Expression]): Option[LogicalPlan] = {
    val spark = SparkSession.active
    val all = graft.operators.ZIndex.resolveEntries(spark, dir, t)
    // zero-row files contribute to no group and no aggregate; WHERE
    // conjuncts admit or exclude whole files (exactly, or bail)
    val admitted = all.filter(_.rows > 0).map { e =>
      val verdicts = filters.map(c => fileAdmits(c, e))
      if (verdicts.exists(_.isEmpty)) None
      else Some((e, verdicts.forall(_.contains(true))))
    }
    if (admitted.exists(_.isEmpty)) return None
    val entries = admitted.flatten.collect { case (e, true) => e }
    val groups: Option[Seq[(Map[ExprId, Literal], Seq[ZoneFile])]] =
      agg.groupingExpressions match {
        case Seq() => Some(Seq((Map.empty[ExprId, Literal], entries)))
        // a TUPLE of single-valued columns partitions files exactly by
        // the composite group (r15 verdict #3): each key must be
        // constant-with-zero-nulls or all-null in EVERY file — one
        // non-constant zone on any key bails the whole serve
        case gs if gs.forall(_.isInstanceOf[AttributeReference]) =>
          val attrs = gs.map(_.asInstanceOf[AttributeReference])
          val perFile: Seq[Option[(Seq[Any], ZoneFile)]] = entries.map { e =>
            val vals = attrs.map(a =>
              e.cols.get(a.name.toLowerCase).flatMap(constOf).flatMap {
                case None => Some(null)
                case Some(raw) => internal(raw, a.dataType)
              })
            if (vals.exists(_.isEmpty)) None
            else Some((vals.map(_.get), e))
          }
          if (perFile.exists(_.isEmpty)) None
          else Some(perFile.flatten
            .groupBy(_._1).toSeq
            .map { case (vs, es) =>
              (attrs.zip(vs).map { case (a, v) =>
                a.exprId -> Literal(v, a.dataType) }.toMap, es.map(_._2)) })
        case _ => None
      }
    groups.flatMap { gs =>
      val rows = gs.map { case (groupLit, es) =>
        val vals = agg.aggregateExpressions
          .map(ne => servedValue(ne, es, groupLit))
        if (vals.forall(_.isDefined))
          Some(InternalRow.fromSeq(vals.map(_.get)))
        else None
      }
      if (rows.forall(_.isDefined)) {
        servedCount.incrementAndGet()
        Some(LocalRelation(agg.output, rows.map(_.get)))
      } else None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transform {
      case agg: Aggregate if agg.aggregateExpressions.nonEmpty &&
          agg.groupingExpressions.forall(
            _.isInstanceOf[AttributeReference]) =>
        zChild(agg.child) match {
          case Some((dir, t, filters)) =>
            serve(agg, dir, t, filters).getOrElse(agg)
          case None => agg
        }
    }

  /** Spec observable: metadata-only rewrites applied in this JVM. */
  private[graft] val servedCount =
    new java.util.concurrent.atomic.AtomicLong
}
