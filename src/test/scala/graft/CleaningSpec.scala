package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.weather.WeatherPipeline

/** Table-driven tests of the quality-score CASE ladder and filters —
  * branch ORDER is semantic (SURVEY §8 Q13): NULL-critical beats outlier;
  * precip-only outlier falls to the ELSE 0.5; humidity/cloud outliers set
  * the flag but do NOT lower the score (reference cleaning.py:87-137).
  */
class CleaningSpec extends SparkSpec {
  import spark.implicits._

  private val ts = Timestamp.valueOf("2024-01-30 12:00:00") // inside lookback

  private def raw(rows: Seq[(Long, Option[Double], Option[Double], Option[Double],
      Option[Int], Option[Int], Boolean)]) =
    rows.toDF("raw_id", "temperature", "wind_speed", "precipitation",
        "humidity", "cloud_cover", "validated")
      .withColumn("station_id", lit("S001"))
      .withColumn("timestamp", lit(ts) + expr("make_interval(0,0,0,0,0,0,raw_id)"))
      .withColumn("pressure", lit(1000.0))
      .withColumn("wind_direction", lit(180))
      .withColumn("visibility", lit(1000.0))
      .withColumn("sunshine", lit(10.0))
      .withColumn("dew_point", lit(5.0))

  private def scores(rows: Seq[(Long, Option[Double], Option[Double], Option[Double],
      Option[Int], Option[Int], Boolean)]): Map[Long, (Double, Boolean)] =
    WeatherPipeline.cleanObservations(raw(rows))
      .select("raw_id", "data_quality_score", "has_outliers")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getBoolean(2))).toMap

  test("quality ladder: all branches, in reference order") {
    val m = scores(Seq(
      (1L, Some(20.0), Some(30.0), Some(1.0), Some(50), Some(50), true),   // perfect -> 1.0
      (2L, None, Some(30.0), Some(1.0), Some(50), Some(50), true),         // missing one -> 0.6
      (3L, Some(55.0), Some(30.0), Some(1.0), Some(50), Some(50), true),   // temp outlier -> 0.3
      (4L, Some(20.0), Some(230.0), Some(1.0), Some(50), Some(50), true),  // wind outlier -> 0.3
      (5L, Some(20.0), Some(30.0), Some(250.0), Some(50), Some(50), true), // precip-only outlier -> ELSE 0.5
      (6L, None, Some(230.0), Some(1.0), Some(50), Some(50), true),        // NULL beats outlier -> 0.6
      (7L, Some(20.0), Some(30.0), Some(1.0), Some(150), Some(50), true),  // humidity outlier: flag only -> 1.0
    ))
    assert(m(1L) === ((1.0, false)))
    assert(m(2L) === ((0.6, false)))
    assert(m(3L) === ((0.3, true)))
    assert(m(4L) === ((0.3, true)))
    assert(m(5L) === ((0.5, true)))
    assert(m(6L) === ((0.6, true)))
    assert(m(7L) === ((1.0, true))) // outlier flag without score penalty — reference parity
  }

  test("completeness filter drops >1 missing criticals; validated filter drops synop") {
    val m = scores(Seq(
      (1L, None, None, Some(1.0), Some(50), Some(50), true),   // 2 missing -> dropped
      (2L, None, None, None, Some(50), Some(50), true),        // 3 missing -> dropped
      (3L, Some(20.0), Some(30.0), Some(1.0), Some(50), Some(50), false), // unvalidated -> dropped
      (4L, Some(20.0), None, Some(1.0), Some(50), Some(50), true),        // 1 missing -> kept
    ))
    assert(m.keySet === Set(4L))
  }

  test("time-window filter excludes rows older than the lookback") {
    val old = raw(Seq((1L, Some(20.0), Some(30.0), Some(1.0), Some(50), Some(50), true)))
      .withColumn("timestamp", lit(Timestamp.valueOf("2023-12-01 00:00:00")))
    assert(WeatherPipeline.cleanObservations(old).count() === 0)
  }

  test("staging dedup keeps the highest raw_id per key (DO UPDATE semantics)") {
    val dup = raw(Seq(
      (10L, Some(20.0), Some(30.0), Some(1.0), Some(50), Some(50), true),
      (11L, Some(21.0), Some(30.0), Some(1.0), Some(50), Some(50), true)))
      .withColumn("timestamp", lit(ts))
    val out = WeatherPipeline.cleanObservations(dup).select("raw_id").collect().map(_.getLong(0))
    assert(out.toSeq === Seq(11L)) // consistent with the cross-batch LastWins merge
  }
}
