package graft.weather

/** DuckDB-SQL mirror of [[WeatherSynth]] + [[WeatherPipeline]] for the
  * driver's oracle gate. Kept in lockstep with the Scala derivations —
  * any change there must land here too.
  *
  * SQL-side determinism notes: fractional literals in pure-integer
  * contexts force DOUBLE via division (DuckDB promotes int/decimal
  * division to DOUBLE); rounding is `round(x*10^d)/10^d`; timestamps are
  * only compared/emitted at whole-second-or-coarser granularity (events
  * carry nanoseconds; Spark reads them floored to microseconds).
  */
object WeatherOracle {

  private val asOf = WeatherPipeline.AsOf
  private val lookback = WeatherPipeline.LookbackHours

  // SQL mirrors of WeatherPipeline.roundSafe / roundInt (two-stage
  // rounding: 1e-8 grid snap, then scale-0 round — see the scaladoc there).
  private def r2(e: String): String =
    s"round(round(($e)*1e8)/1e6)/100 + 0.0"
  private def ri(e: String): String =
    s"CAST(round(round(($e)*1e8)/1e8) AS INT)"
  private def idw(c: String): String =
    s"SUM($c*idw_weight)/NULLIF(SUM(idw_weight),0.0::DOUBLE)"
  private val windNorm: String = {
    val m = "degrees(atan2(SUM(sin(radians(wind_direction))*idw_weight), " +
      "SUM(cos(radians(wind_direction))*idw_weight)))"
    s"CASE WHEN $m < 0 THEN $m + 360 WHEN $m >= 360 THEN $m - 360 ELSE $m END"
  }
  private val qualityScore: String =
    "(CAST(SUM(CAST(data_quality_score AS DECIMAL(3,1))) AS DOUBLE)/COUNT(*)) * 0.6" +
    " + LEAST(COUNT(DISTINCT station_id)/3.0, 1.0::DOUBLE) * 0.2" +
    " + (1.0 - LEAST((SUM(distance_km)/COUNT(*))/50.0, 1.0::DOUBLE)) * 0.2"

  /** Shared gold metric list (obs and fc differ only in keys/time field). */
  private def goldMetrics: String = Seq(
    s"${r2(idw("temperature"))} AS temperature_avg",
    s"${r2("MIN(temperature)")} AS temperature_min",
    s"${r2("MAX(temperature)")} AS temperature_max",
    s"${r2(idw("precipitation"))} AS precipitation_sum",
    s"${r2(idw("wind_speed"))} AS wind_speed_avg",
    s"${r2("MAX(wind_speed)")} AS wind_speed_max",
    s"${ri(windNorm)} AS wind_direction_avg",
    s"${ri(idw("cloud_cover"))} AS cloud_cover_avg",
    s"${r2(idw("pressure"))} AS pressure_msl_avg",
    s"${ri(idw("sunshine"))} AS sunshine_sum",
    s"${ri(idw("visibility"))} AS visibility_avg",
    s"${r2(idw("dew_point"))} AS dew_point_avg",
    s"${ri(idw("humidity"))} AS relative_humidity_avg",
    "CAST(COUNT(DISTINCT station_id) AS INT) AS num_stations",
    s"round(round(($qualityScore)*1e8)/1e6)/100 + 0.0 AS avg_quality_score",
    s"${r2("MAX(distance_km)")} AS max_distance_km").mkString(",\n    ")

  /** Shared CTE preamble: synth tables → staging → gold, both data types. */
  val preamble: String =
    s"""WITH stations AS (
       |  SELECT 'S' || lpad(CAST(c_custkey AS VARCHAR),3,'0') AS station_id,
       |         c_name AS station_name,
       |         52.0 + (c_custkey % 97)/50.0 AS latitude,
       |         12.5 + ((c_custkey*7) % 89)/25.0 AS longitude
       |  FROM customer WHERE c_custkey < 100),
       |postal AS (
       |  SELECT '1' || lpad(CAST(n_nationkey AS VARCHAR),4,'0') AS postal_code,
       |         n_name AS city,
       |         52.0 + (n_nationkey % 10)/5.0 AS centroid_lat,
       |         12.5 + ((n_nationkey*3) % 18)/5.0 AS centroid_lon
       |  FROM nation),
       |raw_obs AS (
       |  SELECT event_id AS raw_id,
       |    'S' || lpad(CAST(user_id % 100 AS VARCHAR),3,'0') AS station_id,
       |    ts AS timestamp,
       |    CASE WHEN event_id % 13 = 0 THEN NULL
       |         WHEN event_id % 53 = 0 THEN 55.0 + value/100.0
       |         ELSE value/10.0 - 5.0 END AS temperature,
       |    CAST(CASE WHEN event_id % 29 = 0 THEN 150 ELSE event_id % 101 END AS INT) AS humidity,
       |    980.0 + value/25.0 AS pressure,
       |    CASE WHEN event_id % 11 = 0 THEN NULL
       |         WHEN event_id % 71 = 0 THEN 230.0
       |         ELSE value/3.0 END AS wind_speed,
       |    CAST((event_id*37) % 360 AS INT) AS wind_direction,
       |    CASE WHEN event_id % 7 = 0 THEN NULL
       |         WHEN event_id % 41 = 0 THEN 250.0
       |         ELSE value/20.0 END AS precipitation,
       |    CAST(CASE WHEN event_id % 37 = 0 THEN 120 ELSE (event_id*3) % 101 END AS INT) AS cloud_cover,
       |    value*50.0 AS visibility,
       |    value/10.0 AS sunshine,
       |    value/30.0 - 2.0 AS dew_point,
       |    (event_id % 10 <> 0) AS validated
       |  FROM events),
       |raw_fc AS (
       |  SELECT event_id AS raw_id,
       |    'S' || lpad(CAST(user_id % 100 AS VARCHAR),3,'0') AS station_id,
       |    date_trunc('day', ts) AS forecast_timestamp,
       |    date_trunc('hour', ts) AS target_timestamp,
       |    CASE WHEN event_id % 17 = 0 THEN NULL
       |         ELSE value/10.0 - 5.0 + ((event_id % 9) - 4)/10.0 END AS temperature,
       |    CAST(event_id % 101 AS INT) AS humidity,
       |    980.0 + value/25.0 AS pressure,
       |    CASE WHEN event_id % 19 = 0 THEN NULL
       |         ELSE value/3.0 + ((event_id % 5) - 2)/10.0 END AS wind_speed,
       |    CAST((event_id*37) % 360 AS INT) AS wind_direction,
       |    CASE WHEN event_id % 7 = 0 THEN NULL
       |         ELSE value/20.0 END AS precipitation,
       |    CAST((event_id*3) % 101 AS INT) AS cloud_cover,
       |    value*50.0 AS visibility,
       |    value/10.0 AS sunshine,
       |    value/30.0 - 2.0 AS dew_point
       |  FROM events),
       |stg_obs AS (
       |  SELECT * FROM (
       |    SELECT *,
       |      ROW_NUMBER() OVER (PARTITION BY station_id, timestamp ORDER BY raw_id DESC) AS rn
       |    FROM (
       |      SELECT raw_id, station_id, timestamp,
       |        temperature, humidity, pressure, wind_speed, wind_direction,
       |        precipitation, cloud_cover, visibility, sunshine, dew_point,
       |        FALSE AS has_missing_values,
       |        CASE WHEN (temperature NOT BETWEEN -40 AND 50 OR
       |                   wind_speed NOT BETWEEN 0 AND 200 OR
       |                   precipitation NOT BETWEEN 0 AND 200 OR
       |                   (humidity IS NOT NULL AND humidity NOT BETWEEN 0 AND 100) OR
       |                   (cloud_cover IS NOT NULL AND cloud_cover NOT BETWEEN 0 AND 100))
       |             THEN TRUE ELSE FALSE END AS has_outliers,
       |        CASE WHEN temperature IS NOT NULL AND wind_speed IS NOT NULL
       |                  AND precipitation IS NOT NULL
       |                  AND temperature BETWEEN -40 AND 50
       |                  AND wind_speed BETWEEN 0 AND 200
       |                  AND precipitation BETWEEN 0 AND 200 THEN 1.0::DOUBLE
       |             WHEN temperature IS NULL OR wind_speed IS NULL
       |                  OR precipitation IS NULL THEN 0.6::DOUBLE
       |             WHEN temperature NOT BETWEEN -40 AND 50
       |                  OR wind_speed NOT BETWEEN 0 AND 200 THEN 0.3::DOUBLE
       |             ELSE 0.5::DOUBLE END AS data_quality_score,
       |        CASE WHEN temperature NOT BETWEEN -40 AND 50
       |               THEN 'Temperature outlier: ' || COALESCE(CAST(CAST(temperature AS DECIMAL(9,2)) AS VARCHAR), 'NULL')
       |             WHEN wind_speed NOT BETWEEN 0 AND 200
       |               THEN 'Wind speed outlier: ' || COALESCE(CAST(CAST(wind_speed AS DECIMAL(9,2)) AS VARCHAR), 'NULL')
       |             WHEN precipitation NOT BETWEEN 0 AND 200
       |               THEN 'Precipitation outlier: ' || COALESCE(CAST(CAST(precipitation AS DECIMAL(9,2)) AS VARCHAR), 'NULL')
       |             WHEN temperature IS NULL OR wind_speed IS NULL
       |               THEN 'Missing critical fields'
       |             ELSE NULL END AS quality_notes
       |      FROM raw_obs
       |      WHERE timestamp >= TIMESTAMP '$asOf' - INTERVAL $lookback HOURS
       |        AND NOT ((CASE WHEN temperature IS NULL THEN 1 ELSE 0 END
       |                + CASE WHEN wind_speed IS NULL THEN 1 ELSE 0 END
       |                + CASE WHEN precipitation IS NULL THEN 1 ELSE 0 END) > 1)
       |        AND validated))
       |  WHERE rn = 1),
       |stg_fc AS (
       |  SELECT * FROM (
       |    SELECT *,
       |      ROW_NUMBER() OVER (PARTITION BY station_id, forecast_timestamp, target_timestamp
       |                         ORDER BY raw_id) AS rn
       |    FROM (
       |      SELECT raw_id, station_id, forecast_timestamp, target_timestamp,
       |        temperature, humidity, pressure, wind_speed, wind_direction,
       |        precipitation, cloud_cover, visibility, sunshine, dew_point,
       |        CASE WHEN temperature IS NOT NULL AND wind_speed IS NOT NULL
       |                  AND precipitation IS NOT NULL
       |                  AND temperature BETWEEN -40 AND 50
       |                  AND wind_speed BETWEEN 0 AND 200
       |                  AND precipitation BETWEEN 0 AND 200 THEN 1.0::DOUBLE
       |             WHEN temperature IS NULL OR wind_speed IS NULL
       |                  OR precipitation IS NULL THEN 0.6::DOUBLE
       |             WHEN temperature NOT BETWEEN -40 AND 50
       |                  OR wind_speed NOT BETWEEN 0 AND 200 THEN 0.3::DOUBLE
       |             ELSE 0.5::DOUBLE END AS data_quality_score
       |      FROM raw_fc
       |      WHERE forecast_timestamp >= TIMESTAMP '$asOf' - INTERVAL $lookback HOURS
       |        AND NOT ((CASE WHEN temperature IS NULL THEN 1 ELSE 0 END
       |                + CASE WHEN wind_speed IS NULL THEN 1 ELSE 0 END
       |                + CASE WHEN precipitation IS NULL THEN 1 ELSE 0 END) > 1)))
       |  WHERE rn = 1),
       |mapped_obs AS (
       |  SELECT s.*, pc.postal_code,
       |    sqrt((st.latitude - pc.centroid_lat)*(st.latitude - pc.centroid_lat)
       |       + (st.longitude - pc.centroid_lon)*(st.longitude - pc.centroid_lon)) * 111.0 AS distance_km
       |  FROM stg_obs s
       |  JOIN stations st ON s.station_id = st.station_id
       |  CROSS JOIN postal pc
       |  WHERE s.data_quality_score >= 0.5
       |    AND sqrt((st.latitude - pc.centroid_lat)*(st.latitude - pc.centroid_lat)
       |           + (st.longitude - pc.centroid_lon)*(st.longitude - pc.centroid_lon)) * 111.0 <= 50.0),
       |weighted_obs AS (
       |  SELECT *, 1.0/NULLIF(distance_km*distance_km, 0.0::DOUBLE) AS idw_weight
       |  FROM mapped_obs),
       |gold_obs AS (
       |  SELECT postal_code,
       |    date_trunc('hour', timestamp) AS timestamp,
       |    'observation' AS data_type,
       |    CAST(NULL AS TIMESTAMP) AS forecast_timestamp,
       |    $goldMetrics
       |  FROM weighted_obs
       |  GROUP BY postal_code, date_trunc('hour', timestamp)
       |  HAVING COUNT(*) >= 1),
       |mapped_fc AS (
       |  SELECT s.*, pc.postal_code,
       |    sqrt((st.latitude - pc.centroid_lat)*(st.latitude - pc.centroid_lat)
       |       + (st.longitude - pc.centroid_lon)*(st.longitude - pc.centroid_lon)) * 111.0 AS distance_km
       |  FROM stg_fc s
       |  JOIN stations st ON s.station_id = st.station_id
       |  CROSS JOIN postal pc
       |  WHERE s.data_quality_score >= 0.5
       |    AND sqrt((st.latitude - pc.centroid_lat)*(st.latitude - pc.centroid_lat)
       |           + (st.longitude - pc.centroid_lon)*(st.longitude - pc.centroid_lon)) * 111.0 <= 50.0),
       |weighted_fc AS (
       |  SELECT *, 1.0/NULLIF(distance_km*distance_km, 0.0::DOUBLE) AS idw_weight
       |  FROM mapped_fc),
       |gold_fc AS (
       |  SELECT postal_code,
       |    date_trunc('hour', target_timestamp) AS timestamp,
       |    'forecast' AS data_type,
       |    forecast_timestamp,
       |    $goldMetrics
       |  FROM weighted_fc
       |  GROUP BY postal_code, date_trunc('hour', target_timestamp), forecast_timestamp
       |  HAVING COUNT(*) >= 1)
       |""".stripMargin

  def withCtes(body: String): String = preamble + body

  val cleanObsSql: String = withCtes(
    """SELECT station_id, CAST(date_trunc('second', timestamp) AS TIMESTAMP) AS ts_sec,
      |  temperature, humidity, pressure, wind_speed, wind_direction,
      |  precipitation, cloud_cover, visibility, sunshine, dew_point,
      |  has_missing_values, has_outliers, data_quality_score, quality_notes, raw_id
      |FROM stg_obs
      |ORDER BY station_id, ts_sec, raw_id""".stripMargin)

  val goldObsSql: String = withCtes(
    """SELECT * FROM gold_obs ORDER BY postal_code, timestamp""".stripMargin)

  val goldFcSql: String = withCtes(
    """SELECT * FROM gold_fc ORDER BY postal_code, timestamp, forecast_timestamp""".stripMargin)

  val accuracySql: String = withCtes(
    """SELECT f.postal_code,
      |  f.forecast_timestamp AS forecast_issue_time,
      |  f.timestamp AS forecast_target_time,
      |  o.timestamp AS observed_time,
      |  ABS(f.temperature_avg - o.temperature_avg) AS temperature_error,
      |  ABS(f.precipitation_sum - o.precipitation_sum) AS precipitation_error,
      |  ABS(f.wind_speed_avg - o.wind_speed_avg) AS wind_speed_error,
      |  (ABS(f.temperature_avg - o.temperature_avg)
      |   + ABS(COALESCE(f.precipitation_sum, 0.0::DOUBLE) - COALESCE(o.precipitation_sum, 0.0::DOUBLE))
      |   + ABS(f.wind_speed_avg - o.wind_speed_avg)) / 3.0 AS mae,
      |  CAST((epoch(f.timestamp) - epoch(f.forecast_timestamp))/3600 AS INT) AS lead_time_hours
      |FROM gold_fc f
      |JOIN gold_obs o ON f.postal_code = o.postal_code AND f.timestamp = o.timestamp
      |  AND f.timestamp <= o.timestamp + INTERVAL 1 HOUR
      |ORDER BY f.postal_code, forecast_issue_time, forecast_target_time""".stripMargin)

  /** q63 oracle: DECIMAL-exact error sums (2-dec errors, 4-dec squares),
    * double division + sqrt only at the end, two-stage rounded.
    */
  val accuracyRmseSql: String = {
    def m(e: String) = r2(s"CAST(SUM(CAST($e AS DECIMAL(18,2))) AS DOUBLE)/COUNT($e)")
    def rm(e: String) = r2(
      s"sqrt(CAST(SUM(CAST($e AS DECIMAL(18,2)) * CAST($e AS DECIMAL(18,2))) AS DOUBLE)/COUNT($e))")
    withCtes(
      s"""SELECT postal_code,
         |  CAST(COUNT(temperature_error) AS BIGINT) AS n_temp,
         |  ${m("temperature_error")} AS mae_temperature,
         |  ${rm("temperature_error")} AS rmse_temperature,
         |  CAST(COUNT(wind_speed_error) AS BIGINT) AS n_wind,
         |  ${m("wind_speed_error")} AS mae_wind_speed,
         |  ${rm("wind_speed_error")} AS rmse_wind_speed
         |FROM (
         |  SELECT f.postal_code,
         |    ABS(f.temperature_avg - o.temperature_avg) AS temperature_error,
         |    ABS(f.wind_speed_avg - o.wind_speed_avg) AS wind_speed_error
         |  FROM gold_fc f
         |  JOIN gold_obs o ON f.postal_code = o.postal_code AND f.timestamp = o.timestamp
         |    AND f.timestamp <= o.timestamp + INTERVAL 1 HOUR)
         |GROUP BY postal_code
         |ORDER BY postal_code""".stripMargin)
  }

  val latestObsSql: String = withCtes(
    """SELECT postal_code, timestamp, temperature_avg, precipitation_sum,
      |  wind_speed_avg, cloud_cover_avg, num_stations, avg_quality_score
      |FROM gold_obs
      |WHERE timestamp = (SELECT MAX(timestamp) FROM gold_obs)
      |ORDER BY postal_code""".stripMargin)

  val latestFcSql: String = withCtes(
    """SELECT postal_code, forecast_timestamp, timestamp AS target_time,
      |  temperature_avg, precipitation_sum, wind_speed_avg, cloud_cover_avg, num_stations
      |FROM gold_fc
      |WHERE forecast_timestamp = (SELECT MAX(forecast_timestamp) FROM gold_fc)
      |ORDER BY postal_code, target_time""".stripMargin)

  val nearestStationsSql: String = withCtes(
    """SELECT postal_code, station_id, station_name, round(distance_km*100)/100 + 0.0 AS distance_km,
      |  CAST(rn AS INT) AS rank
      |FROM (
      |  SELECT pc.postal_code, st.station_id, st.station_name,
      |    sqrt((st.latitude - pc.centroid_lat)*(st.latitude - pc.centroid_lat)
      |       + (st.longitude - pc.centroid_lon)*(st.longitude - pc.centroid_lon)) * 111.0 AS distance_km,
      |    ROW_NUMBER() OVER (PARTITION BY pc.postal_code
      |      ORDER BY sqrt((st.latitude - pc.centroid_lat)*(st.latitude - pc.centroid_lat)
      |                  + (st.longitude - pc.centroid_lon)*(st.longitude - pc.centroid_lon)) * 111.0,
      |        st.station_id) AS rn
      |  FROM postal pc CROSS JOIN stations st
      |  WHERE sqrt((st.latitude - pc.centroid_lat)*(st.latitude - pc.centroid_lat)
      |           + (st.longitude - pc.centroid_lon)*(st.longitude - pc.centroid_lon)) * 111.0 <= 50.0)
      |WHERE rn <= 3
      |ORDER BY postal_code, rank""".stripMargin)

  /** q62 oracle: plain cross-join + exact radius — semantically identical
    * to the Spark side's grid-cell equi-join, so a hash match proves the
    * cell cover is lossless (no dropped corner pairs, no double matches).
    */
  val gridSpatialJoinSql: String = withCtes(
    s"""SELECT pc.postal_code, st.station_id,
       |  ${r2("sqrt((st.latitude - pc.centroid_lat)*(st.latitude - pc.centroid_lat) + (st.longitude - pc.centroid_lon)*(st.longitude - pc.centroid_lon)) * 111.0")} AS distance_km
       |FROM postal pc CROSS JOIN stations st
       |WHERE sqrt((st.latitude - pc.centroid_lat)*(st.latitude - pc.centroid_lat)
       |         + (st.longitude - pc.centroid_lon)*(st.longitude - pc.centroid_lon)) * 111.0 <= 50.0
       |ORDER BY postal_code, station_id""".stripMargin)

  val historySql: String = withCtes(
    s"""SELECT * FROM (
       |  SELECT * FROM gold_obs
       |  WHERE postal_code = '10003'
       |    AND timestamp >= TIMESTAMP '$asOf' - INTERVAL 72 HOURS
       |  ORDER BY timestamp DESC LIMIT 24)
       |ORDER BY timestamp""".stripMargin)

  /** q177 — postal-prefix region rollup over gold observations (the
    * z-serve layer's StartsWith + time-range consumer). Aggregates are
    * exact selections/integer sums, so no float discipline needed
    * beyond gold's own rounded columns. */
  val regionHistorySql: String = withCtes(
    s"""SELECT postal_code, CAST(COUNT(*) AS BIGINT) AS n_rows,
       |  MAX(temperature_max) AS max_temp,
       |  MIN(temperature_min) AS min_temp,
       |  CAST(SUM(num_stations) AS BIGINT) AS sum_stations
       |FROM gold_obs
       |WHERE postal_code LIKE '1001%'
       |  AND timestamp >= TIMESTAMP '$asOf' - INTERVAL 72 HOURS
       |GROUP BY postal_code
       |ORDER BY postal_code""".stripMargin)

  /** q179 — gold-observations stats heartbeat (metadata-served Spark-
    * side; the oracle recomputes over the gold CTE). */
  val goldStatsSql: String = withCtes(
    """SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  MIN(postal_code) AS min_postal, MAX(postal_code) AS max_postal,
      |  CAST(COUNT(temperature_avg) AS BIGINT) AS n_temp,
      |  MIN(num_stations) AS min_stations,
      |  MAX(num_stations) AS max_stations
      |FROM gold_obs""".stripMargin)

  /** q182 — the per-type heartbeat over UNIFIED gold (grouped
    * metadata-serve Spark-side; the oracle recomputes over the gold
    * CTEs). Hour-truncated timestamps render identically cross-engine
    * (the q24 convention). */
  val goldHeartbeatSql: String = withCtes(
    """SELECT data_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  MIN(timestamp) AS min_hour, MAX(timestamp) AS max_hour,
      |  CAST(COUNT(temperature_avg) AS BIGINT) AS n_temp,
      |  MIN(postal_code) AS min_postal, MAX(postal_code) AS max_postal
      |FROM (SELECT * FROM gold_obs UNION ALL SELECT * FROM gold_fc)
      |GROUP BY data_type
      |ORDER BY data_type""".stripMargin)

  /** q183 — the filtered freshness probe (metadata-served Spark-side
    * off whole-file predicate verdicts; the oracle recomputes over the
    * observation CTE — the WHERE'd union and gold_obs are the same
    * population). */
  val goldFreshnessSql: String = withCtes(
    """SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  MIN(timestamp) AS min_hour, MAX(timestamp) AS max_hour,
      |  CAST(COUNT(temperature_avg) AS BIGINT) AS n_temp,
      |  MIN(postal_code) AS min_postal, MAX(postal_code) AS max_postal
      |FROM gold_obs""".stripMargin)

  /** q187 — the daily per-type rollup (metadata-served Spark-side off
    * the (type, day)-pure layout; the oracle recomputes over the gold
    * CTEs — `CAST(ts AS DATE)` is exactly the layout's to_date(prep)
    * on these UTC hour-truncated timestamps). */
  val goldDailySql: String = withCtes(
    """SELECT data_type, CAST(timestamp AS DATE) AS day,
      |  CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  MIN(timestamp) AS min_hour, MAX(timestamp) AS max_hour,
      |  CAST(COUNT(temperature_avg) AS BIGINT) AS n_temp,
      |  MIN(postal_code) AS min_postal, MAX(postal_code) AS max_postal
      |FROM (SELECT * FROM gold_obs UNION ALL SELECT * FROM gold_fc)
      |GROUP BY data_type, CAST(timestamp AS DATE)
      |ORDER BY data_type, day""".stripMargin)

  /** q188 — the per-type day inventory (COUNT(DISTINCT day) served
    * from the file constants Spark-side; the oracle recomputes). */
  val goldDayInventorySql: String = withCtes(
    """SELECT data_type,
      |  CAST(COUNT(DISTINCT CAST(timestamp AS DATE)) AS BIGINT) AS n_days,
      |  CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  MIN(CAST(timestamp AS DATE)) AS first_day,
      |  MAX(CAST(timestamp AS DATE)) AS last_day
      |FROM (SELECT * FROM gold_obs UNION ALL SELECT * FROM gold_fc)
      |GROUP BY data_type
      |ORDER BY data_type""".stripMargin)

  /** True-geodesic KNN — haversine formula mirrored op-for-op from
    * GeoFunctions.haversineKm (1-ulp trig noise absorbed by two-stage
    * rounding; ordering gaps ≥1e-7 on the synthetic grid).
    */
  val haversineKnnSql: String = withCtes(
    """, hav AS (
      |  SELECT pc.postal_code, st.station_id,
      |    2*6371.0088*asin(sqrt(
      |      pow(sin(radians(pc.centroid_lat - st.latitude)/2), 2)
      |      + cos(radians(st.latitude)) * cos(radians(pc.centroid_lat))
      |        * pow(sin(radians(pc.centroid_lon - st.longitude)/2), 2))) AS distance_km
      |  FROM postal pc CROSS JOIN stations st),
      |ranked AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY postal_code
      |    ORDER BY distance_km, station_id) AS rn
      |  FROM hav)
      |SELECT postal_code, station_id,
      |  round(round((distance_km)*1e8)/1e6)/100 + 0.0 AS distance_km,
      |  CAST(rn AS INT) AS rank
      |FROM ranked WHERE rn <= 3
      |ORDER BY postal_code, rank""".stripMargin)

  /** O2 forecast-horizon endpoint (reference weather.py:114-137). */
  val horizonSql: String = withCtes(
    """SELECT * FROM gold_fc
      |WHERE postal_code = '10003'
      |  AND timestamp > TIMESTAMP '2024-01-28 00:00:00'
      |  AND timestamp <= TIMESTAMP '2024-01-28 00:00:00' + INTERVAL 48 HOURS
      |ORDER BY timestamp, forecast_timestamp""".stripMargin)

  /** F8 bounding-box station filter (reference stations.py:26-37). */
  val bboxSql: String = withCtes(
    """SELECT station_id, latitude, longitude FROM stations
      |WHERE latitude BETWEEN 52.2 AND 53.2 AND longitude BETWEEN 13.0 AND 15.0
      |ORDER BY station_id""".stripMargin)

  /** ML-ready validation report (reference transform.py:126-265 thresholds). */
  val validationSql: String = withCtes(
    """, gold_all AS (
      |  SELECT data_type, postal_code, avg_quality_score, temperature_avg, num_stations
      |  FROM gold_obs
      |  UNION ALL
      |  SELECT data_type, postal_code, avg_quality_score, temperature_avg, num_stations
      |  FROM gold_fc),
      |rep AS (
      |  SELECT data_type,
      |    CAST(COUNT(DISTINCT postal_code) AS BIGINT) AS n_postal,
      |    CAST(COUNT(*) AS BIGINT) AS n_rows,
      |    CAST(SUM(CAST(avg_quality_score AS DECIMAL(5,2))) AS DOUBLE)/COUNT(*) AS avg_quality,
      |    COUNT(*) FILTER (WHERE temperature_avg IS NULL) AS n_null_temp,
      |    COUNT(*) FILTER (WHERE num_stations = 0) AS n_zero_station
      |  FROM gold_all GROUP BY data_type)
      |SELECT data_type, n_postal, n_rows,
      |  (n_postal >= 50) AS coverage_ok,
      |  (avg_quality >= 0.5) AS quality_ok,
      |  (n_null_temp * 5 <= n_rows) AS null_temp_ok,
      |  (n_zero_station * 10 <= n_rows) AS zero_station_ok
      |FROM rep ORDER BY data_type""".stripMargin)

  val temporalSql: String = withCtes(
    """, lagged AS (
      |  SELECT station_id, timestamp, temperature,
      |    LAG(temperature) OVER (PARTITION BY station_id ORDER BY timestamp) AS prev_temp,
      |    LAG(timestamp) OVER (PARTITION BY station_id ORDER BY timestamp) AS prev_ts
      |  FROM stg_obs)
      |SELECT station_id, CAST(COUNT(*) AS BIGINT) AS n_issues
      |FROM lagged
      |WHERE prev_temp IS NOT NULL AND ABS(temperature - prev_temp) > 20
      |  AND epoch(date_trunc('second', timestamp)) - epoch(date_trunc('second', prev_ts)) <= 3600
      |GROUP BY station_id
      |ORDER BY station_id""".stripMargin)
}
