package graft

import org.apache.spark.sql.functions._

import graft.plans.{SynopsisStats, ValueSynopsis}

/** [[ValueSynopsis]] histograms feeding Catalyst's OWN filter
  * estimation, proven on executed-plan statistics (the r11 extension of
  * SynopsisStatsSpec's statistics-tier claim from join keys to range
  * predicates): on a skewed value column, the uniform [min,max]
  * interpolation Spark falls back to without a histogram mis-estimates
  * a range predicate by orders of magnitude, while the equi-height
  * histogram sliced from the house bottom-k row sample lands within
  * sampling tolerance — same table, same predicate, same CBO machinery,
  * the histogram is the only variable. Also pins the synopsis-vs-truth
  * contract directly: bin boundaries are sample elements, heights sum
  * to the non-null row count, and the sample-fraction estimator (q164's)
  * agrees with the histogram's whole-bin mass.
  */
class SynopsisHistogramSpec extends SparkSpec {

  // 90% of rows in [0, 100], 10% in [100000, 1000000]: uniform
  // interpolation puts ~0.01% of mass under 100; the truth is 90%.
  private val N = 60000
  private def skewed(i: Int): Long =
    if (i % 10 != 0) (i % 101).toLong
    else 100000L + (i.toLong * 9973L) % 900001L

  test("histogram fixes the skewed-range estimate through Spark's own FilterEstimation") {
    import spark.implicits._
    val name = "synh_t"
    spark.sql(s"DROP TABLE IF EXISTS $name")
    try {
      val df = (1 to N).map(i => (i.toLong, skewed(i))).toDF("id", "v")
      df.write.mode("overwrite").saveAsTable(name)
      val trueLow = df.filter(col("v") <= 100).count()
      assert(trueLow > N * 8L / 10L, s"fixture degenerate: $trueLow")

      val vs = ValueSynopsis.build(spark, name, spark.table(name),
        col("id"), col("v"), k = 1024)
      assert(vs.rows === N.toLong && vs.nullCount === 0L)
      assert(vs.vMin === Some(0L) || vs.vMin === Some(1L))

      // the synopsis-internal contract, before any planner is involved
      val hist = vs.histogram(32).get
      assert(hist.bins.length === 32)
      assert(math.abs(hist.height * 32 - N) < 1e-6)
      val sampleVals = vs.sample.map(_._2).toSet
      // outer endpoints are the TRUE column extremes (Catalyst asserts
      // the histogram covers colStat [min, max]); interior boundaries
      // are sample elements
      assert(hist.bins.head.lo === vs.vMin.get.toDouble)
      assert(hist.bins.last.hi === vs.vMax.get.toDouble)
      hist.bins.iterator.drop(1).foreach { b =>
        assert(sampleVals.contains(b.lo.toLong),
          "interior bin boundaries must be sample elements")
      }
      hist.bins.foreach(b => assert(b.lo <= b.hi && b.ndv >= 1L))
      assert(hist.bins.sliding(2).forall(p => p(0).hi === p(1).lo),
        "adjacent bins share boundaries (ANALYZE's percentile convention)")

      def lowEstimate(): BigInt = {
        val plan = spark.table(name).filter(col("v") <= 100)
          .queryExecution.optimizedPlan
        plan.stats.rowCount.getOrElse(sys.error("no rowCount under CBO"))
      }
      spark.conf.set("spark.sql.cbo.enabled", "true")
      // the TABLE rowCount is physical rows = non-null + null (the
      // colStat's nullCount/rowCount ratio is the null fraction — a
      // vs.rows-only inject on a null-bearing column would overstate
      // it; self-review r11)
      val tableRows = vs.rows + vs.nullCount
      try {
        // tier 1: NDV + min/max only (no histogram) => uniform
        // interpolation; the skewed fixture makes it miss by >10x
        SynopsisStats.inject(spark, name, tableRows,
          keyCols = Map.empty,
          extraCols = Map("v" -> SynopsisStats.valueStat(vs, numBins = 32)
            .copy(histogram = None)))
        val uniform = lowEstimate()
        assert(uniform.toDouble < trueLow.toDouble / 10.0,
          s"uniform estimate should collapse on this fixture: $uniform vs $trueLow")

        // tier 2: same stats + the sample histogram => within sampling
        // tolerance of the truth (k=1024 uniform sample, B=32 bins:
        // boundary rank error ~1/sqrt(k), bin granularity 1/32)
        SynopsisStats.inject(spark, name, tableRows,
          keyCols = Map.empty,
          extraCols = Map("v" -> SynopsisStats.valueStat(vs, numBins = 32)))
        val hisEst = lowEstimate()
        val rel = math.abs(hisEst.toDouble - trueLow.toDouble) / trueLow.toDouble
        assert(rel < 0.15,
          s"histogram estimate must land near truth: $hisEst vs $trueLow (rel $rel)")
      } finally spark.conf.unset("spark.sql.cbo.enabled")
    } finally spark.sql(s"DROP TABLE IF EXISTS $name")
  }

  test("empty and all-null columns produce no histogram, not a crash") {
    import spark.implicits._
    val empty = Seq.empty[(Long, java.lang.Long)].toDF("id", "v")
    val vsE = ValueSynopsis.build(spark, "e", empty, col("id"), col("v"))
    assert(vsE.nKept === 0 && vsE.histogram(8).isEmpty && vsE.vMin.isEmpty)
    val nulls = (1L to 50L).map(i => (i, null.asInstanceOf[java.lang.Long]))
      .toDF("id", "v")
    val vsN = ValueSynopsis.build(spark, "n", nulls, col("id"), col("v"))
    assert(vsN.rows === 0L && vsN.nullCount === 50L)
    assert(vsN.histogram(8).isEmpty)
  }
}
