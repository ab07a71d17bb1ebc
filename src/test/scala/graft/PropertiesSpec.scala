package graft

import org.apache.spark.sql.functions._
import graft.functions.GeoFunctions

/** Property-style tests for the pure column functions (SURVEY §5 item 3):
  * seeded random sampling (no scalatest/scalacheck bridge in the offline
  * cache), evaluated through the actual Catalyst expressions via one-row
  * selects — not a Scala re-implementation.
  */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(42)
  private val N = 40

  private def evalHav(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double =
    Seq(1).toDF("x").select(
      GeoFunctions.haversineKm(lit(lat1), lit(lon1), lit(lat2), lit(lon2))).head().getDouble(0)

  test("haversine: symmetric, non-negative, bounded by half circumference") {
    // evaluate all samples in one job — per-row Catalyst eval, batched
    val samples = Seq.fill(N)((rnd.nextDouble * 178 - 89, rnd.nextDouble * 358 - 179,
      rnd.nextDouble * 178 - 89, rnd.nextDouble * 358 - 179))
    val rows = samples.toDF("a", "b", "c", "d").select(
      GeoFunctions.haversineKm(col("a"), col("b"), col("c"), col("d")).as("ab"),
      GeoFunctions.haversineKm(col("c"), col("d"), col("a"), col("b")).as("ba"))
      .collect()
    rows.foreach { r =>
      val (ab, ba) = (r.getDouble(0), r.getDouble(1))
      assert(ab === ba)
      assert(ab >= 0.0 && ab <= math.Pi * GeoFunctions.EarthRadiusKm + 1e-6)
    }
  }

  test("circular mean of a single direction is that direction, any weight") {
    val samples = Seq.fill(N)((rnd.nextInt(360), rnd.nextDouble * 99.9 + 0.1))
    samples.foreach { case (d, w) =>
      val m = Seq(d).toDF("d")
        .agg(GeoFunctions.circularMeanDeg(col("d"), lit(w)).as("m"))
        .select(GeoFunctions.normalizeDeg(col("m"))).head().getDouble(0)
      val diff = math.min(math.abs(m - d), 360 - math.abs(m - d))
      assert(diff < 1e-6, s"dir $d weight $w -> $m")
    }
  }

  test("normalizeDeg lands in [0,360) over its single-wrap contract range") {
    val samples = Seq.fill(4 * N)(rnd.nextDouble * 1079.99 - 360 + 1e-9)
    val rows = samples.toDF("d")
      .select(GeoFunctions.normalizeDeg(col("d")).as("n"), col("d")).collect()
    rows.foreach { r =>
      assert(r.getDouble(0) >= 0.0 && r.getDouble(0) < 360.0,
        s"${r.getDouble(1)} -> ${r.getDouble(0)}")
    }
  }

  test("quality ladder is total over present/missing/outlier combinations") {
    def opt(p: Double, g: => Double): Option[Double] =
      if (rnd.nextDouble < p) None else Some(g)
    val samples = Seq.tabulate(2 * N) { i =>
      (i.toLong,
        opt(0.25, rnd.nextDouble * 380 - 80),
        opt(0.25, rnd.nextDouble * 380 - 80),
        opt(0.25, rnd.nextDouble * 380 - 80),
        if (rnd.nextDouble < 0.25) None else Some(rnd.nextInt(210) - 10),
        if (rnd.nextDouble < 0.25) None else Some(rnd.nextInt(210) - 10))
    }
    val df = samples
      .toDF("raw_id", "temperature", "wind_speed", "precipitation", "humidity", "cloud_cover")
      .withColumn("validated", lit(true))
      .withColumn("station_id", lit("S1"))
      .withColumn("timestamp",
        lit(java.sql.Timestamp.valueOf("2024-01-30 12:00:00")) +
          expr("make_interval(0,0,0,0,0,0,raw_id)"))
      .withColumn("pressure", lit(1000.0))
      .withColumn("wind_direction", lit(0))
      .withColumn("visibility", lit(0.0))
      .withColumn("sunshine", lit(0.0))
      .withColumn("dew_point", lit(0.0))
    val out = graft.weather.WeatherPipeline.cleanObservations(df)
      .select("raw_id", "data_quality_score").collect()
    val expectedKept = samples.count(s => Seq(s._2, s._3, s._4).count(_.isEmpty) <= 1)
    assert(out.length === expectedKept)
    out.foreach(r => assert(Set(1.0, 0.6, 0.3, 0.5).contains(r.getDouble(1))))
  }
}
