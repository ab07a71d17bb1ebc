package graft.plans

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.{Histogram, HistogramBin}
import org.apache.spark.sql.functions._

/** VALUE-DISTRIBUTION synopsis — the range-predicate companion of
  * [[KeySynopsis]] (which carries join-key frequencies). Catalyst's
  * filter estimation without a histogram is uniform interpolation over
  * [min, max]: on a skewed column (the common shape — long-tailed
  * prices, latencies, token counts) a range predicate's selectivity
  * estimate can be off by orders of magnitude, which then poisons every
  * downstream join-order and broadcast decision through the same
  * statistics chain [[SynopsisStats]] feeds. ANALYZE can build
  * equi-height histograms, but only by a dedicated percentile scan per
  * column (`spark.sql.statistics.histogram.enabled`).
  *
  * This synopsis gets the histogram off the house bounded-sample
  * machinery instead: the [[graft.functions.QuantileSketch]] bottom-k
  * by md5(row identity) is a uniform without-replacement row sample
  * (q159's estimator), so slicing its value-sorted form into B
  * equal-count segments IS an equi-height histogram with ~1/√k rank
  * error on each boundary — one corpus pass shared with min/max/counts
  * and a value-KMV for the column NDV, no percentile aggregation.
  * Mirrors ANALYZE's storage exactly: `Histogram(height = non-null
  * rows / B, bins = [lo, hi, ndv])` in [[org.apache.spark.sql.catalyst
  * .catalog.CatalogColumnStat]], consumed by Spark's own
  * FilterEstimation (SynopsisHistogramSpec pins the executed-plan
  * estimates: uniform off by >10x on the skewed fixture, histogram
  * within tolerance).
  *
  * Values are LONG by contract (the engine's exact-cents convention,
  * q159-q163); the caller casts. Sample semantics and the q164 oracle
  * query share the same kept-set definition, so the synopsis the
  * planner eats is the one the gate hash-verifies.
  */
final case class ValueSynopsis(
    name: String,
    /** non-null value rows (histogram height's numerator). */
    rows: Long,
    nullCount: Long,
    k: Int,
    /** kept (hash, value) rows — bottom-k by md5(row identity) —
      * sorted by (value, hash) ascending: the q159 storage form
      * re-sorted for rank selection. */
    sample: Vector[(String, Long)],
    /** KMV NDV estimate over md5(value). */
    ndvEst: Double,
    vMin: Option[Long],
    vMax: Option[Long]) {

  def nKept: Int = sample.size

  /** Equi-height histogram from the sample: B equal-count segments of
    * the value-sorted kept set; interior bin boundaries are sample
    * ELEMENTS (shared between adjacent bins, ANALYZE's percentile
    * convention), while the outermost lo/hi are the column's TRUE
    * min/max off the build pass — Catalyst's `numBinsHoldingRange`
    * ASSERTS the histogram covers the colStat [min, max] (ANALYZE's
    * percentile-0/1 endpoints are exact extremes; a sample-bounded
    * histogram that stops short crashes estimation, not merely skews
    * it). Per-bin NDV is the segment's distinct-value count scaled so
    * the bins sum to the column NDV estimate. None when the sample is
    * empty. */
  def histogram(numBins: Int = 32): Option[Histogram] = {
    val m = nKept
    if (m == 0 || rows == 0L) return None
    val b = math.min(numBins, m)
    val vs = sample.map(_._2)
    val sampleNdv = vs.distinct.size
    val ndvScale = math.max(ndvEst, 1.0) / math.max(sampleNdv, 1).toDouble
    val loAll = math.min(vMin.getOrElse(vs.head), vs.head).toDouble
    val hiAll = math.max(vMax.getOrElse(vs.last), vs.last).toDouble
    val bins = (0 until b).map { i =>
      val from = (i.toLong * m / b).toInt
      val until = ((i + 1).toLong * m / b).toInt
      val seg = vs.slice(from, until)
      // lo = previous boundary (shared); extremes stretched to truth
      val lo = if (i == 0) loAll else vs(from - 1).toDouble
      val hi = if (i == b - 1) hiAll else seg.last.toDouble
      val segNdv = math.max(1L, math.round(seg.distinct.size * ndvScale))
      HistogramBin(lo, hi, segNdv)
    }.toArray
    Some(Histogram(rows.toDouble / b, bins))
  }
}

object ValueSynopsis {

  val K = 1024

  /** One corpus pass, four aggregates sharing the scan: the uniform
    * row sample (quantile-sketch kept set), the value-KMV for NDV, and
    * min/max/counts. The collected result is one row, O(k) wide. */
  def build(spark: SparkSession, name: String, df: DataFrame,
      id: Column, value: Column, k: Int = K): ValueSynopsis = {
    val v = value.cast("long")
    val row: Row = df
      .agg(
        graft.functions.QuantileSketchAgg.qsketch(
          spark, md5(id.cast("string")), v, k).as("smp"),
        graft.functions.KmvSketchAgg.kmv(
          spark, md5(v.cast("string")), k).as("ks"),
        min(v).as("mn"), max(v).as("mx"),
        count(v).as("nv"), count(lit(1)).as("nr"))
      .collect()(0)
    val smp = row.getSeq[Row](0)
      .map(r => r.getString(0) -> r.getLong(1))
      .sortBy { case (h, vv) => (vv, h) }
      .toVector
    val ks = row.getStruct(1)
    val nKept = ks.getInt(ks.fieldIndex("n_kept"))
    val hk = ks.getString(ks.fieldIndex("hk"))
    val ndv =
      if (nKept < k || hk == null) nKept.toDouble
      else (k - 1).toDouble / JoinSynopsis.unit(hk)
    val nv = row.getLong(row.fieldIndex("nv"))
    val nr = row.getLong(row.fieldIndex("nr"))
    ValueSynopsis(name, nv, nr - nv, k, smp, ndv,
      if (row.isNullAt(row.fieldIndex("mn"))) None
      else Some(row.getLong(row.fieldIndex("mn"))),
      if (row.isNullAt(row.fieldIndex("mx"))) None
      else Some(row.getLong(row.fieldIndex("mx"))))
  }

  /** Per-type value synopses served ENTIRELY from the maintained sketch
    * table ([[graft.operators.KmvTable.statsView]] + the sample view) —
    * an ANALYZE whose corpus scan already happened: the maintenance
    * pass that keeps the sketch table fresh is the only scan the
    * statistics ever cost. Merging is exact synopsis algebra, KB-scale
    * on the driver (synopses are planner metadata): the corpus sample
    * is bottom-k of the union of daily kept sets (row identities are
    * unique, so daily sets are disjoint — the q161/q163 law); the
    * value-KMV union dedups (the same value recurs across days) and
    * re-takes bottom-k; counts add; bounds take min/max. The result for
    * each type EQUALS [[build]] run over that type's population frame
    * with the table's k (ValueSynopsisTableSpec pins the equality
    * field-by-field, histogram included). nullCount is 0 by
    * construction — the table's population already excludes null
    * value/event_id rows; inject over a population, not the raw feed. */
  def fromTable(spark: SparkSession, dir: String,
      table: Option[DataFrame] = None): Map[String, ValueSynopsis] = {
    import org.apache.spark.sql.Row
    val k = graft.operators.KmvTable.K
    // `table`: an already-maintained frame (see JoinSynopsis.fromTable)
    val rows = table.getOrElse(graft.operators.KmvTable.maintain(spark, dir))
      .select(col("event_type"), col("smp"), col("kv"), col("n"),
        col("vmin"), col("vmax"))
      .collect()
    rows.groupBy(_.getString(0)).flatMap { case (t, rs) =>
      val n = rs.map(_.getLong(3)).sum
      if (n == 0L) None
      else {
        // dedup before bottom-k: a row identity REPLAYED on two days
        // sits in both days' kept sets, and the sketch aggregate the
        // equality pin compares against is idempotent on duplicates
        // (TreeMap REPLACE) — an undeduped union would spend two of the
        // k slots on one row and displace the true k-th element. Dedup
        // is by HASH ALONE (r11 ADVICE): the aggregate's REPLACE
        // contract keeps exactly one slot per row identity, so an
        // identity that recurs with a DIFFERENT value (a corrected
        // replay) must still occupy one slot here; the kept value is
        // the minimum — a deterministic canonicalization (REPLACE's own
        // survivor is insertion-order-dependent; under the corpus
        // contract that row identities are value-stable the two agree,
        // which is what ValueSynopsisTableSpec's equality pin relies on)
        val smp = rs.flatMap(_.getSeq[Row](1)
            .map(r => r.getString(0) -> r.getLong(1)))
          .groupBy(_._1).iterator
          .map { case (h, ps) => h -> ps.map(_._2).min }
          .toSeq.sortBy(_._1).take(k)
        val kv = rs.flatMap(_.getSeq[String](2)).distinct.sorted.take(k)
        Some(t -> ValueSynopsis(
          name = t, rows = n, nullCount = 0L, k = k,
          sample = smp.sortBy { case (h, v) => (v, h) }.toVector,
          ndvEst = if (kv.size < k) kv.size.toDouble
                   else (k - 1).toDouble / JoinSynopsis.unit(kv.last),
          vMin = rs.collect { case r if !r.isNullAt(4) => r.getLong(4) }
            .reduceOption(_ min _),
          vMax = rs.collect { case r if !r.isNullAt(5) => r.getLong(5) }
            .reduceOption(_ max _)))
      }
    }
  }
}
