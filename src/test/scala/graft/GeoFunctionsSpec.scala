package graft

import org.apache.spark.sql.functions._
import graft.functions.GeoFunctions._

class GeoFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): Double =
    Seq(1).toDF("x").select(c.cast("double")).head().getDouble(0)

  test("haversine Berlin->Hamburg ~= 255 km") {
    val d = one(haversineKm(lit(52.52), lit(13.405), lit(53.5511), lit(9.9937)))
    assert(math.abs(d - 255.0) < 3.0, s"got $d")
  }

  test("haversine is symmetric and zero at identity") {
    val ab = one(haversineKm(lit(52.0), lit(13.0), lit(48.1), lit(11.6)))
    val ba = one(haversineKm(lit(48.1), lit(11.6), lit(52.0), lit(13.0)))
    assert(ab === ba)
    assert(one(haversineKm(lit(52.0), lit(13.0), lit(52.0), lit(13.0))) === 0.0)
  }

  test("haversine within 0.5% of PostGIS geodesic reference value") {
    // ST_Distance(geography) Berlin->Munich is ~504.4 km
    val d = one(haversineKm(lit(52.52), lit(13.405), lit(48.1351), lit(11.582)))
    assert(math.abs(d - 504.4) / 504.4 < 0.005, s"got $d")
  }

  test("circular mean straddling north: 350 and 10 -> 0, not 180") {
    val df = Seq(350, 10).toDF("d").agg(circularMeanDeg(col("d"), lit(1.0)).as("m"))
    val m = df.select(normalizeDeg(col("m"))).head().getDouble(0)
    assert(math.abs(m) < 1e-9 || math.abs(m - 360) < 1e-9, s"got $m")
  }

  test("circular mean weights dominate") {
    val df = Seq((90, 100.0), (270, 1.0)).toDF("d", "w")
      .agg(circularMeanDeg(col("d"), col("w")).as("m"))
    val m = df.select(normalizeDeg(col("m"))).head().getDouble(0)
    assert(math.abs(m - 90.0) < 1.0, s"got $m")
  }

  test("normalizeDeg wraps atan2 range to [0,360)") {
    val vals = Seq(-179.0, -1.0, 0.0, 359.9, 360.0, 365.0)
    val got = vals.map(v => one(normalizeDeg(lit(v))))
    assert(got === Seq(181.0, 359.0, 0.0, 359.9, 0.0, 5.0))
  }

  test("gridCell groups nearby points, separates far ones") {
    val c1 = one(gridCell(lit(52.51), lit(13.41), 0.5))
    val c2 = one(gridCell(lit(52.52), lit(13.40), 0.5))
    val c3 = one(gridCell(lit(53.55), lit(9.99), 0.5))
    assert(c1 === c2)
    assert(c1 !== c3)
  }
}
