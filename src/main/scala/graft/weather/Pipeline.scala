package graft.weather

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Upsert

/** End-to-end orchestration of the weather lifecycle (SURVEY §3.1):
  * bronze (synth raw) → silver (cleaned staging, upserted) → gold (IDW
  * postal rollup, upserted) → accuracy, with the reference's runtime
  * validations (`transform.py:126-265`) as assertable checks.
  *
  * Replaces the Airflow DAG + psycopg2 plumbing with three pure stages and
  * keyed Parquet merges; the whole run is idempotent (PipelineSpec runs it
  * twice and diffs gold).
  */
object Pipeline {

  final case class Layers(base: String) {
    val stgObs = s"$base/stg_observations"
    val stgFc = s"$base/stg_forecasts"
    val gold = s"$base/analytics_weather_by_postal_code"
    val accuracy = s"$base/analytics_forecast_accuracy"
  }

  /** Run the full transform against the corpus at `dir`, persisting layers
    * under `out` with the reference's upsert semantics (staging/gold
    * DO UPDATE ⇒ LastWins on the processing stamp).
    */
  def run(spark: SparkSession, dir: String, out: String): Layers = {
    // dims from the statistics catalog (r12): aggregateToPostal carries
    // no broadcast() hints anymore, so the J1/J2 decisions need the
    // injected dimension statistics — same route as the q21/q22 gold
    val (stations, postal) = WeatherStats.dims(spark, dir)
    runWithRaws(spark,
      WeatherSynth.rawObservations(spark, dir),
      WeatherSynth.rawForecasts(spark, dir),
      stations, postal, out)
  }

  /** Same transform over caller-supplied bronze frames — the micro-batch
    * entry point: each cron tick passes only the newly ingested slice and
    * the keyed upserts accumulate staging, from which gold is re-derived
    * (the reference's re-processing-window model, SURVEY §2.10).
    * Dimension statistics are the CALLER's contract here: the gold joins
    * are hint-free, so at scale pass statistics-backed dim frames
    * ([[WeatherStats.dims]]) — a raw derived frame's size-only estimate
    * never shrinks through its filters, which can cost J1 its broadcast.
    */
  def runWithRaws(spark: SparkSession, rawObs: DataFrame, rawFc: DataFrame,
      stations: DataFrame, postal: DataFrame, out: String): Layers = {
    val layers = Layers(out)

    val stgObs = WeatherPipeline.cleanObservations(rawObs)
    Upsert.mergeIntoParquet(stgObs, layers.stgObs,
      Seq("station_id", "timestamp"), "raw_id", Upsert.Mode.LastWins)

    val stgFc = WeatherPipeline.cleanForecasts(rawFc)
    Upsert.mergeIntoParquet(stgFc, layers.stgFc,
      Seq("station_id", "forecast_timestamp", "target_timestamp"), "raw_id",
      Upsert.Mode.FirstWins)

    val goldObs = WeatherPipeline.aggregateToPostal(
      spark.read.parquet(layers.stgObs), stations, postal, "observation")
    val goldFc = WeatherPipeline.aggregateToPostal(
      spark.read.parquet(layers.stgFc), stations, postal, "forecast")
    // gold upsert key (postal_code, timestamp, data_type, forecast_timestamp);
    // num_stations stands in for an updated_at stamp (deterministic corpus)
    // gold partitioned by data_type (the serving layer's hottest filter) —
    // partition pruning replaces the reference's composite B-tree indexes
    Upsert.mergeIntoParquet(goldObs.unionByName(goldFc), layers.gold,
      Seq("postal_code", "timestamp", "data_type", "forecast_timestamp"),
      "num_stations", Upsert.Mode.LastWins, partitionCols = Seq("data_type"))

    val acc = WeatherPipeline.forecastAccuracy(spark.read.parquet(layers.gold))
    Upsert.mergeIntoParquet(acc, layers.accuracy,
      Seq("postal_code", "forecast_issue_time", "forecast_target_time"),
      "lead_time_hours", Upsert.Mode.LastWins)
    layers
  }

  /** ML-ready validation report (reference `transform.py:126-265` — its
    * failures are logged, not raised; here each check returns a row so
    * callers decide). Thresholds are the reference's.
    */
  def validate(gold: DataFrame): DataFrame = {
    val byType = gold.groupBy(col("data_type")).agg(
      countDistinct(col("postal_code")).as("n_postal"),
      (sum(col("avg_quality_score").cast("decimal(5,2)")).cast("double") / count(lit(1)))
        .as("avg_quality"),
      count(when(col("temperature_avg").isNull, 1)).as("n_null_temp"),
      count(when(col("num_stations") === 0, 1)).as("n_zero_station"),
      count(lit(1)).as("n_rows"))
    byType.select(
      col("data_type"),
      col("n_postal"),
      col("n_rows"),
      (col("n_postal") >= 50).as("coverage_ok"),          // ≥50 postal codes/type
      (col("avg_quality") >= 0.5).as("quality_ok"),        // avg quality ≥ 0.5
      (col("n_null_temp") * 5 <= col("n_rows")).as("null_temp_ok"),     // ≤20%
      (col("n_zero_station") * 10 <= col("n_rows")).as("zero_station_ok")) // ≤10%
  }
}
