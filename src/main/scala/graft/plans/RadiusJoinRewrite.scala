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

  /** `dist <= bound` or the strict `dist < bound` — the ≤-cover is sound
    * for both (a strict predicate only REMOVES pairs from the post-filter,
    * never adds one outside the cell cover). Yields (dist, bound).
    */
  private object RadiusCmp {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case LessThanOrEqual(d, b) => Some((d, b))
      case LessThan(d, b) => Some((d, b))
      case _ => None
    }
  }

  /** `sqrt(d1² + d2²) * k <= r` (or `<`) with literal k, r. */
  private object RadiusConjunct {
    def unapply(e: Expression): Option[(Expression, Expression, Expression, Expression, Double, Double)] =
      e match {
        case RadiusCmp(
            Multiply(Sqrt(Add(Sq(Subtract(a1, b1, _)), Sq(Subtract(a2, b2, _)), _)), Literal(k: Double, DoubleType), _),
            Literal(r: Double, DoubleType)) if k > 0 && r >= 0 =>
          Some((a1, b1, a2, b2, k, r))
        case _ => None
      }
  }

  /** `sin²(radians(b − a) / 2)` — the half-angle term of the haversine
    * formula, as built by both `GeoFunctions.haversineKm` (Column API) and
    * the `graft_haversine_km` SQL builder. Yields (a, b).
    */
  private object HalfAngleSin2 {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case Sq(Sin(Divide(ToRadians(Subtract(b, a, _)), Literal(2.0, DoubleType), _)))
        => Some((a, b))
      case _ => None
    }
  }

  /** `2R · asin(sqrt(sin²(Δφ/2) + cos φ₁ cos φ₂ sin²(Δλ/2)))` — the full
    * haversine call with literal sphere radius. Yields
    * (lat1, lon1, lat2, lon2, R_km); the cos pair is checked to be exactly
    * the latitudes of the Δφ term so an arbitrary lookalike can't match.
    */
  private object HaversineCall {
    private def latsMatch(c1: Expression, c2: Expression,
        lat1: Expression, lat2: Expression): Boolean =
      (c1.semanticEquals(lat1) && c2.semanticEquals(lat2)) ||
        (c1.semanticEquals(lat2) && c2.semanticEquals(lat1))

    def unapply(e: Expression): Option[(Expression, Expression, Expression, Expression, Double)] = {
      val body = e match {
        case Multiply(Literal(c: Double, DoubleType), inner, _) if c > 0 => Some((c, inner))
        case Multiply(inner, Literal(c: Double, DoubleType), _) if c > 0 => Some((c, inner))
        case _ => None
      }
      body.flatMap {
        case (c, Asin(Sqrt(Add(
            HalfAngleSin2(lat1, lat2),
            Multiply(Multiply(Cos(ToRadians(c1)), Cos(ToRadians(c2)), _),
              HalfAngleSin2(lon1, lon2), _), _))))
            if latsMatch(c1, c2, lat1, lat2) =>
          Some((lat1, lon1, lat2, lon2, c / 2))
        case _ => None
      }
    }
  }

  /** `haversine_km(lat1, lon1, lat2, lon2) <= r` (or `<`) with literal r ≥ 0. */
  private object HaversineConjunct {
    def unapply(e: Expression): Option[(Expression, Expression, Expression, Expression, Double, Double)] =
      e match {
        case RadiusCmp(HaversineCall(lat1, lon1, lat2, lon2, sphereR),
            Literal(r: Double, DoubleType)) if r >= 0 =>
          Some((lat1, lon1, lat2, lon2, sphereR, r))
        case _ => None
      }
  }

  /** Relative inflation of the cell size over the proven bound: absorbs
    * the float error of the per-row cell-coordinate arithmetic (and of the
    * matched predicate's own evaluation), so a qualifying pair can never
    * land two cells apart from boundary rounding. Semantically free — the
    * exact original predicate still post-filters.
    */
  private val FpMargin = 1 + 1e-6

  /** 3D stride: cell indexes are bounded by R/cell < 1e6 (guarded at
    * match time), so |i|·S² + |j|·S + |k| stays well inside Long.
    */
  private val Stride3 = 1L << 21

  /** Earth-centered 3D coordinates of a (lat°, lon°) point on the sphere
    * of radius R — the chord-grid axes for the haversine rewrite.
    */
  private def xyz(lat: Expression, lon: Expression, sphereR: Double)
      : (Expression, Expression, Expression) = {
    val latR = ToRadians(lat); val lonR = ToRadians(lon)
    val rc = Multiply(Literal(sphereR), Cos(latR))
    (Multiply(rc, Cos(lonR)), Multiply(rc, Sin(lonR)),
      Multiply(Literal(sphereR), Sin(latR)))
  }

  /** One join side's cell expressions, built from its k grid axes:
    * `own` packs the row's floor indices into a single long key;
    * `prep` aliases each floor index so the neighbor fan is computed
    * FROM THE ALIASED ATTRIBUTES in a Project beneath the Generate —
    * the fan itself is then just literal ±1 adds and stride multiplies.
    * Embedding the full axis trees into every CreateArray element
    * instead would re-evaluate the trig/divide work up to 3^k times per
    * exploded row.
    */
  private case class SideCells(own: Expression, prep: Seq[Alias], fan: Seq[Expression])

  private def sideCells(axes: Seq[Expression], strides: Seq[Long], cell: Double): SideCells = {
    val floors = axes.map(a => Floor(Divide(a, Literal(cell))))
    val own = floors.zip(strides)
      .map { case (f, st) => Multiply(f, Literal(st)): Expression }
      .reduce(Add(_, _))
    val prep = floors.zipWithIndex.map { case (f, i) => Alias(f, s"${CellName}_ax$i")() }
    val attrs = prep.map(_.toAttribute)
    val deltas = axes.indices.foldLeft(Seq(Seq.empty[Long]))((acc, _) =>
      acc.flatMap(ds => (-1L to 1L).map(d => ds :+ d)))
    val fan = deltas.map { ds =>
      attrs.zip(ds).zip(strides).map { case ((a, d), st) =>
        Multiply(if (d == 0L) a: Expression else Add(a, Literal(d)), Literal(st)): Expression
      }.reduce(Add(_, _))
    }
    SideCells(own, prep, fan)
  }

  private def planarCells(c1: Expression, c2: Expression, cellDeg: Double): SideCells =
    sideCells(Seq(c1, c2), Seq(Stride, 1L), cellDeg)

  private def sphereCells(lat: Expression, lon: Expression,
      sphereR: Double, cell: Double): SideCells = {
    val (x, y, z) = xyz(lat, lon, sphereR)
    sideCells(Seq(x, y, z), Seq(Stride3 * Stride3, Stride3, 1L), cell)
  }

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

  /** Orient a (lat, lon) POINT pair: both coordinates of point 1 must sit
    * on one side and both of point 2 on the other — the chord-cover proof
    * is about the two points, so a lat/lon split across sides (legal but
    * degenerate SQL) must not match. Yields (latL, lonL, latR, lonR).
    */
  private def orientPoints(l: LogicalPlan, r: LogicalPlan,
      lat1: Expression, lon1: Expression, lat2: Expression, lon2: Expression)
      : Option[(Expression, Expression, Expression, Expression)] = {
    def from(p: LogicalPlan, e: Expression) =
      e.deterministic && e.dataType == DoubleType &&
        e.references.nonEmpty && e.references.subsetOf(p.outputSet)
    if (from(l, lat1) && from(l, lon1) && from(r, lat2) && from(r, lon2))
      Some((lat1, lon1, lat2, lon2))
    else if (from(l, lat2) && from(l, lon2) && from(r, lat1) && from(r, lon1))
      Some((lat2, lon2, lat1, lon1))
    else None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner | Cross, Some(cond), hint)
        if !(left.output ++ right.output).exists(_.name.startsWith(CellName)) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val hit: Option[(SideCells, SideCells)] = conjuncts.iterator.flatMap {
        case RadiusConjunct(a1, b1, a2, b2, k, r) =>
          for {
            (l1, r1) <- orient(left, right, a1, b1)
            (l2, r2) <- orient(left, right, a2, b2)
            if r / k > 0
          } yield (planarCells(l1, l2, r / k * FpMargin),
            planarCells(r1, r2, r / k * FpMargin))
        case HaversineConjunct(lat1, lon1, lat2, lon2, sphereR, r) =>
          // Arc ≤ r ⟺ 3D chord ≤ 2R·sin(r/2R), and a chord bounds every
          // axis delta — so cells of that size with a 3×3×3 fan cover all
          // qualifying pairs at ANY latitude (no cos-collapse at poles,
          // unlike a lon/lat grid). Skip when the radius covers the whole
          // sphere (nothing to prune) or is so small the cell index would
          // overflow the packing (r ≲ 7 m on Earth).
          val chord = 2 * sphereR * math.sin(math.min(r / sphereR, math.Pi) / 2)
          val cell = chord * FpMargin
          for {
            (latL, lonL, latR, lonR) <-
              orientPoints(left, right, lat1, lon1, lat2, lon2)
            if r / sphereR < math.Pi && cell > 0 && sphereR / cell < 1e6
          } yield (sphereCells(latL, lonL, sphereR, cell),
            sphereCells(latR, lonR, sphereR, cell))
        case _ => None
      }.take(1).toSeq.headOption

      hit match {
        case None => j
        case Some((cpL, cpR)) =>
          // the neighbor-fan explode goes on the SMALLER side (9–27× a
          // dimension table is noise; the same fan on the fact side wastes
          // an order of magnitude) — the bigger side computes its single
          // own-cell.
          val explodeLeft = left.stats.sizeInBytes < right.stats.sizeInBytes

          def ownCell(p: LogicalPlan, sc: SideCells) = {
            val a = Alias(sc.own, CellName + "_l")()
            (Project(p.output :+ a, p), a.toAttribute: Expression)
          }
          def neighborCells(p: LogicalPlan, sc: SideCells) = {
            val rAttr = AttributeReference(CellName + "_r", LongType)()
            (Generate(Explode(CreateArray(sc.fan)), unrequiredChildIndex = Nil,
              outer = false, qualifier = None, generatorOutput = Seq(rAttr),
              child = Project(p.output ++ sc.prep, p)), rAttr: Expression)
          }

          val ((newLeft, cellL), (newRight, cellR)) =
            if (explodeLeft) (neighborCells(left, cpL), ownCell(right, cpR))
            else (ownCell(left, cpL), neighborCells(right, cpR))
          val newCond = And(cond, EqualTo(cellL, cellR))
          val newJoin = Join(newLeft, newRight, Inner, Some(newCond), hint)
          Project(j.output, newJoin)
      }
  }
}
