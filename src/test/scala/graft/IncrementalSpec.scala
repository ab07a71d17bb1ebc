package graft

import org.apache.spark.sql.functions._
import graft.weather.{Pipeline, WeatherSynth}

/** Incremental convergence — the reference's cron micro-batch model
  * (SURVEY §2.10): ingesting bronze in two slices through the keyed
  * upserts must yield byte-identical gold to a single full-batch run.
  */
class IncrementalSpec extends SparkSpec {

  test("two-slice incremental run converges to the single-shot gold") {
    val stations = WeatherSynth.stations(spark, Sf)
    val postal = WeatherSynth.postalCodes(spark, Sf)
    val rawObs = WeatherSynth.rawObservations(spark, Sf)
    val rawFc = WeatherSynth.rawForecasts(spark, Sf)

    // single-shot reference
    val full = TempDirs.create("graft_full")
    val fullLayers = Pipeline.run(spark, Sf, full)
    val expected = spark.read.parquet(fullLayers.gold)
      .orderBy("postal_code", "timestamp", "data_type").collect().toSeq

    // incremental: even raw ids first, then odd
    val inc = TempDirs.create("graft_inc")
    Pipeline.runWithRaws(spark,
      rawObs.filter(col("raw_id") % 2 === 0), rawFc.filter(col("raw_id") % 2 === 0),
      stations, postal, inc)
    val incLayers = Pipeline.runWithRaws(spark,
      rawObs.filter(col("raw_id") % 2 === 1), rawFc.filter(col("raw_id") % 2 === 1),
      stations, postal, inc)
    val got = spark.read.parquet(incLayers.gold)
      .orderBy("postal_code", "timestamp", "data_type").collect().toSeq

    assert(got.size === expected.size)
    assert(got === expected)
  }
}
