package graft.weather

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Deterministic derivation of the reference's weather data model
  * (stations / postal codes / raw observations / raw forecasts — reference
  * `sql/schema.sql:12-104`) from the driver corpus, so the weather pipeline
  * runs under the DuckDB-oracle gate on shared inputs. Every expression is
  * integer arithmetic or a single double op — cross-engine exact.
  *
  * [[WeatherOracle.preamble]] holds the SQL-side mirror of these
  * derivations; keep the two in lockstep.
  */
object WeatherSynth {

  /** 100 weather stations on a Berlin-ish grid (reference
    * `sql/schema.sql:27-40`; geometry → plain lat/lon per SURVEY §1.2).
    */
  def stations(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .filter(col("c_custkey") < 100)
      .select(
        concat(lit("S"), lpad(col("c_custkey").cast("string"), 3, "0")).as("station_id"),
        col("c_name").as("station_name"),
        (lit(52.0) + (col("c_custkey") % 97) / 50.0).as("latitude"),
        (lit(12.5) + ((col("c_custkey") * 7) % 89) / 25.0).as("longitude"),
        (col("c_custkey") % 200).cast("int").as("altitude"),
        lit("brightsky").as("source"))

  /** 25 postal-code rows with precomputed centroids (reference
    * `sql/schema.sql:12-20`; ST_Centroid precomputed at load, SURVEY §4.3).
    */
  def postalCodes(spark: SparkSession, dir: String): DataFrame =
    Tables.nation(spark, dir)
      .select(
        concat(lit("1"), lpad(col("n_nationkey").cast("string"), 4, "0")).as("postal_code"),
        col("n_name").as("city"),
        (lit(52.0) + (col("n_nationkey") % 10) / 5.0).as("centroid_lat"),
        (lit(12.5) + ((col("n_nationkey") * 3) % 18) / 5.0).as("centroid_lon"))

  /** Raw hourly observations (reference `sql/schema.sql:47-69`): NULLs,
    * physical-limit outliers and unvalidated (synop-style) rows are
    * synthesized on deterministic event_id residues so every branch of the
    * cleaning ladder (reference `cleaning.py:87-137`) is exercised.
    */
  def rawObservations(spark: SparkSession, dir: String): DataFrame =
    rawObservationsFrom(Tables.events(spark, dir))

  /** Same projection over an arbitrary events frame — the hook the bronze
    * landing uses (WeatherQueries feeds the µs/date-partitioned landing in
    * here so the cleaning ladder's time filter prunes at the reader).
    */
  def rawObservationsFrom(events: DataFrame): DataFrame =
    events.select(
      col("event_id").as("raw_id"),
      concat(lit("S"), lpad((col("user_id") % 100).cast("string"), 3, "0")).as("station_id"),
      col("ts").as("timestamp"),
      when(col("event_id") % 13 === 0, lit(null).cast("double"))
        .when(col("event_id") % 53 === 0, lit(55.0) + col("value") / 100.0)
        .otherwise(col("value") / 10.0 - 5.0).as("temperature"),
      when(col("event_id") % 29 === 0, lit(150)).otherwise((col("event_id") % 101).cast("int"))
        .cast("int").as("humidity"),
      (lit(980.0) + col("value") / 25.0).as("pressure"),
      when(col("event_id") % 11 === 0, lit(null).cast("double"))
        .when(col("event_id") % 71 === 0, lit(230.0))
        .otherwise(col("value") / 3.0).as("wind_speed"),
      ((col("event_id") * 37) % 360).cast("int").as("wind_direction"),
      when(col("event_id") % 7 === 0, lit(null).cast("double"))
        .when(col("event_id") % 41 === 0, lit(250.0))
        .otherwise(col("value") / 20.0).as("precipitation"),
      when(col("event_id") % 37 === 0, lit(120)).otherwise(((col("event_id") * 3) % 101).cast("int"))
        .cast("int").as("cloud_cover"),
      (col("value") * 50.0).as("visibility"),
      (col("value") / 10.0).as("sunshine"),
      (col("value") / 30.0 - 2.0).as("dew_point"),
      (col("event_id") % 10 =!= 0).as("validated"))

  /** Raw forecasts (reference `sql/schema.sql:78-101`): bitemporal —
    * issued daily (`forecast_timestamp`), valid hourly
    * (`target_timestamp`), measures perturbed slightly vs observations so
    * accuracy errors are non-zero.
    */
  def rawForecasts(spark: SparkSession, dir: String): DataFrame =
    rawForecastsFrom(Tables.events(spark, dir))

  /** See [[rawObservationsFrom]]. */
  def rawForecastsFrom(events: DataFrame): DataFrame =
    events.select(
      col("event_id").as("raw_id"),
      concat(lit("S"), lpad((col("user_id") % 100).cast("string"), 3, "0")).as("station_id"),
      date_trunc("day", col("ts")).as("forecast_timestamp"),
      date_trunc("hour", col("ts")).as("target_timestamp"),
      when(col("event_id") % 17 === 0, lit(null).cast("double"))
        .otherwise(col("value") / 10.0 - 5.0 + ((col("event_id") % 9) - 4) / 10.0).as("temperature"),
      (col("event_id") % 101).cast("int").as("humidity"),
      (lit(980.0) + col("value") / 25.0).as("pressure"),
      when(col("event_id") % 19 === 0, lit(null).cast("double"))
        .otherwise(col("value") / 3.0 + ((col("event_id") % 5) - 2) / 10.0).as("wind_speed"),
      ((col("event_id") * 37) % 360).cast("int").as("wind_direction"),
      when(col("event_id") % 7 === 0, lit(null).cast("double"))
        .otherwise(col("value") / 20.0).as("precipitation"),
      ((col("event_id") * 3) % 101).cast("int").as("cloud_cover"),
      (col("value") * 50.0).as("visibility"),
      (col("value") / 10.0).as("sunshine"),
      (col("value") / 30.0 - 2.0).as("dew_point"))
}
