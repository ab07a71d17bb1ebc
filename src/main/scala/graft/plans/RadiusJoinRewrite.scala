package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Optimizer rule: rewrite the naive planar radius join
  *
  * {{{ a.crossJoin(b).filter(sqrt((x1-x2)^2 + (y1-y2)^2) * k <= r) }}}
  *
  * into a grid-cell EQUI-join — the same construction as
  * `WeatherPipeline.spatialJoinGrid` (q62), applied automatically. The
  * naive form plans as a BroadcastNestedLoopJoin (or cartesian product
  * once neither side broadcasts): every pair is enumerated, O(|a|·|b|) at
  * any scale. The rewrite:
  *
  *  1. computes each left row's grid cell at `cellDeg = r / k` resolution;
  *  2. explodes each right row into its 3×3 cell neighborhood
  *     (`Generate(Explode(array(9 cells)))` — one extra column, 9× the
  *     small side, zero extra shuffles of the big side);
  *  3. joins on cell equality — `ExtractEquiJoinKeys` then picks a hash
  *     join — and keeps the ORIGINAL radius predicate as the exact
  *     post-filter, so results are bit-identical (RadiusRewriteSpec
  *     asserts equality against the un-extended session).
  *
  * Soundness of the cover: if `sqrt(dx²+dy²)·k ≤ r` then `|dx| ≤ r/k =
  * cellDeg` (and likewise dy), so the two rows' cell indices differ by at
  * most 1 per axis — every qualifying pair meets in exactly one of the 9
  * neighbor cells (each left row owns ONE cell, so no pair matches twice).
  *
  * The rule fires only on the exact shape it can prove: inner/cross join
  * whose condition (after Spark's own predicate pushdown moves the filter
  * into the join) contains the planar conjunct with literal k > 0, r ≥ 0,
  * deterministic per-side coordinate expressions of DoubleType. Everything
  * else passes through untouched. Registered via
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
object RadiusJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private val CellName = "__graft_cell"
  /** lat-cell stride in the packed long cell id (same as GeoFunctions.gridCell). */
  private val Stride = 100000L

  /** x² as written by the DataFrame API (`d*d`) or SQL (`pow(d, 2)`). */
  private object Sq {
    def unapply(e: Expression): Option[Expression] = e match {
      case Multiply(a, b, _) if a.semanticEquals(b) => Some(a)
      case Pow(a, Literal(2.0, DoubleType)) => Some(a)
      case _ => None
    }
  }

  /** `sqrt(d1² + d2²) * k <= r` with literal k, r. */
  private object RadiusConjunct {
    def unapply(e: Expression): Option[(Expression, Expression, Expression, Expression, Double, Double)] =
      e match {
        case LessThanOrEqual(
            Multiply(Sqrt(Add(Sq(Subtract(a1, b1, _)), Sq(Subtract(a2, b2, _)), _)), Literal(k: Double, DoubleType), _),
            Literal(r: Double, DoubleType)) if k > 0 && r >= 0 =>
          Some((a1, b1, a2, b2, k, r))
        case _ => None
      }
  }

  private def floorCell(coord: Expression, cellDeg: Double, delta: Int): Expression = {
    val f = Floor(Divide(coord, Literal(cellDeg)))
    if (delta == 0) f else Add(f, Literal(delta.toLong))
  }

  private def packedCell(c1: Expression, c2: Expression, cellDeg: Double,
      d1: Int = 0, d2: Int = 0): Expression =
    Add(Multiply(floorCell(c1, cellDeg, d1), Literal(Stride)),
      floorCell(c2, cellDeg, d2))

  /** The four coordinate expressions, oriented (left-side, right-side) per
    * axis — or None if they don't split cleanly across the join.
    */
  private def orient(l: LogicalPlan, r: LogicalPlan,
      a: Expression, b: Expression): Option[(Expression, Expression)] = {
    def from(p: LogicalPlan, e: Expression) =
      e.deterministic && e.dataType == DoubleType &&
        e.references.nonEmpty && e.references.subsetOf(p.outputSet)
    if (from(l, a) && from(r, b)) Some((a, b))
    else if (from(l, b) && from(r, a)) Some((b, a))
    else None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner | Cross, Some(cond), hint)
        if !(left.output ++ right.output).exists(_.name.startsWith(CellName)) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val hit = conjuncts.iterator.flatMap {
        case RadiusConjunct(a1, b1, a2, b2, k, r) =>
          for {
            (l1, r1) <- orient(left, right, a1, b1)
            (l2, r2) <- orient(left, right, a2, b2)
            if r / k > 0
          } yield (l1, r1, l2, r2, r / k)
        case _ => None
      }.take(1).toSeq.headOption

      hit match {
        case None => j
        case Some((l1, r1, l2, r2, cellDeg)) =>
          // 3x3 explode goes on the SMALLER side (9x a dimension table is
          // noise; 9x the fact side wastes a near-order of magnitude) —
          // the bigger side computes its single own-cell.
          val explodeLeft = left.stats.sizeInBytes < right.stats.sizeInBytes

          def ownCell(p: LogicalPlan, c1: Expression, c2: Expression) = {
            val a = Alias(packedCell(c1, c2, cellDeg), CellName + "_l")()
            (Project(p.output :+ a, p), a.toAttribute: Expression)
          }
          def neighborCells(p: LogicalPlan, c1: Expression, c2: Expression) = {
            val cells9 = for (d1 <- -1 to 1; d2 <- -1 to 1)
              yield packedCell(c1, c2, cellDeg, d1, d2)
            val rAttr = AttributeReference(CellName + "_r", LongType, nullable = false)()
            (Generate(Explode(CreateArray(cells9)), unrequiredChildIndex = Nil,
              outer = false, qualifier = None, generatorOutput = Seq(rAttr),
              child = p), rAttr: Expression)
          }

          val ((newLeft, cellL), (newRight, cellR)) =
            if (explodeLeft) (neighborCells(left, l1, l2), ownCell(right, r1, r2))
            else (ownCell(left, l1, l2), neighborCells(right, r1, r2))
          val newCond = And(cond, EqualTo(cellL, cellR))
          val newJoin = Join(newLeft, newRight, Inner, Some(newCond), hint)
          Project(j.output, newJoin)
      }
  }
}
