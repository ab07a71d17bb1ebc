package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.{Ingest, Tables}

/** Driver-contract wiring for the ingestion layer: JSON payloads are
  * synthesized from events with IDENTICAL string construction in both
  * engines (ints and DECIMAL-rendered doubles only — no raw double→text),
  * then parsed through the real `from_json` path (S2/S3), type-routed
  * (F7), past/future split (F6), discovered (J5) and registry-merged (S7).
  */
object IngestOps {

  private val AsOf = "2024-01-15 00:00:00" // mid-corpus: both splits non-empty

  // q55/q56 share the parsed-records frame (and q56 scans it twice for
  // discovery + rollup); memoize+cache per (session, dir)
  private val memo =
    scala.collection.mutable.Map.empty[(SparkSession, String), DataFrame]

  private def parsedRecords(spark: SparkSession, dir: String): DataFrame =
    memo.synchronized {
      memo.getOrElseUpdate((spark, dir),
        Ingest.parseWeather(weatherJson(spark, dir), "payload").cache())
    }

  /** Unpersist + drop memoized frames (see [[graft.weather.WeatherQueries.clear]]). */
  def clear(): Unit = memo.synchronized {
    memo.values.foreach(df => df.unpersist(blocking = false))
    memo.clear()
  }

  /** Weather-record JSON per event; temperature omitted on the %13 residue
    * to exercise missing-field tolerance; source_id spills past the
    * station registry (0..119 vs registered 0..99) for discovery.
    */
  private def weatherJson(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).select(
      concat(
        lit("{\"timestamp\":\""),
        date_format(date_trunc("second", col("ts")), "yyyy-MM-dd'T'HH:mm:ss'Z'"),
        lit("\",\"source_id\":"), (col("user_id") % 120).cast("string"),
        when(col("event_id") % 13 === 0, lit(""))
          .otherwise(concat(lit(",\"temperature\":"),
            col("value").cast("decimal(18,2)").cast("string"))),
        lit(",\"relative_humidity\":"), (col("event_id") % 101).cast("string"),
        lit(",\"pressure_msl\":"),
        (lit(980).cast("decimal(18,2)") + col("value").cast("decimal(18,2)")).cast("string"),
        lit("}")).as("payload"))

  // NB: inside these CTE strings no line may START with "||" — they are
  // interpolated into an outer stripMargin string which would eat the
  // first pipe as a margin character.
  private val weatherJsonSqlCte: String =
    """wx AS (
      |  SELECT '{"timestamp":"' || strftime(date_trunc('second', ts), '%Y-%m-%dT%H:%M:%SZ') ||
      |    '","source_id":' || CAST(user_id % 120 AS VARCHAR) ||
      |    CASE WHEN event_id % 13 = 0 THEN ''
      |         ELSE ',"temperature":' || CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR) END ||
      |    ',"relative_humidity":' || CAST(event_id % 101 AS VARCHAR) ||
      |    ',"pressure_msl":' || CAST(CAST(980 AS DECIMAL(18,2)) + CAST(value AS DECIMAL(18,2)) AS VARCHAR) ||
      |    '}' AS payload
      |  FROM events)""".stripMargin

  /** Source-metadata JSON per distinct source id; observation_type cycles
    * historical/synop/current/unknown_type on the %4 residue.
    */
  private def sourceJson(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select((col("user_id") % 120).as("sid")).distinct()
      .select(concat(
        lit("{\"id\":"), col("sid").cast("string"),
        lit(",\"station_name\":\"ST-"), col("sid").cast("string"),
        lit("\",\"observation_type\":\""),
        element_at(array(lit("historical"), lit("synop"), lit("current"), lit("unknown_type")),
          (col("sid") % 4 + 1).cast("int")),
        lit("\"}")).as("payload"))

  private val sourceJsonSqlCte: String =
    """src AS (
      |  SELECT '{"id":' || CAST(sid AS VARCHAR) ||
      |    ',"station_name":"ST-' || CAST(sid AS VARCHAR) ||
      |    '","observation_type":"' ||
      |    ['historical','synop','current','unknown_type'][CAST(sid % 4 + 1 AS INT)] ||
      |    '"}' AS payload
      |  FROM (SELECT DISTINCT user_id % 120 AS sid FROM events))""".stripMargin

  // ------------------------------------------------------------------
  // q55 — full ingest parse pipeline: S2/S3 from_json → F7 routing
  // (unknown types dropped, validated = historical) → F6 past/future
  // split → per-route aggregation.
  // ------------------------------------------------------------------
  def q55IngestParse(spark: SparkSession, dir: String): DataFrame = {
    val records = parsedRecords(spark, dir)
    val sources = Ingest.parseSources(sourceJson(spark, dir), "payload")
    val routed = Ingest.routeByType(records, sources)
    val (past, future) = Ingest.splitPastFuture(routed, lit(AsOf).cast("timestamp"))
    past.withColumn("route", lit("observation"))
      .unionByName(future.withColumn("route", lit("forecast")))
      .groupBy(col("route"), col("observation_type"), col("validated"))
      .agg(
        count(lit(1)).as("n"),
        count(when(col("temperature").isNull, 1)).as("n_missing_temp"),
        sum(col("temperature").cast("decimal(18,2)")).cast("double").as("sum_temp"),
        sum(col("humidity")).as("sum_humidity"),
        countDistinct(col("source_id")).as("n_sources"))
      .orderBy(col("route"), col("observation_type"))
  }

  val q55Sql: String =
    s"""WITH $weatherJsonSqlCte,
       |$sourceJsonSqlCte,
       |records AS (
       |  SELECT strptime(json_extract_string(payload, '$$.timestamp'), '%Y-%m-%dT%H:%M:%SZ') AS timestamp,
       |    CAST(json_extract_string(payload, '$$.source_id') AS BIGINT) AS source_id,
       |    CAST(json_extract_string(payload, '$$.temperature') AS DOUBLE) AS temperature,
       |    CAST(json_extract_string(payload, '$$.relative_humidity') AS INT) AS humidity
       |  FROM wx),
       |sources AS (
       |  SELECT CAST(json_extract_string(payload, '$$.id') AS BIGINT) AS source_id,
       |    json_extract_string(payload, '$$.observation_type') AS observation_type
       |  FROM src),
       |routed AS (
       |  SELECT r.*, s.observation_type,
       |    (s.observation_type = 'historical') AS validated
       |  FROM records r JOIN sources s USING (source_id)
       |  WHERE s.observation_type IN ('historical', 'synop', 'current')),
       |both_routes AS (
       |  SELECT *, 'observation' AS route FROM routed WHERE timestamp < TIMESTAMP '$AsOf'
       |  UNION ALL
       |  SELECT *, 'forecast' FROM routed WHERE timestamp > TIMESTAMP '$AsOf')
       |SELECT route, observation_type, validated,
       |  CAST(COUNT(*) AS BIGINT) AS n,
       |  CAST(COUNT(*) FILTER (WHERE temperature IS NULL) AS BIGINT) AS n_missing_temp,
       |  CAST(SUM(CAST(temperature AS DECIMAL(18,2))) AS DOUBLE) AS sum_temp,
       |  CAST(SUM(humidity) AS BIGINT) AS sum_humidity,
       |  CAST(COUNT(DISTINCT source_id) AS BIGINT) AS n_sources
       |FROM both_routes
       |GROUP BY route, observation_type, validated
       |ORDER BY route, observation_type""".stripMargin

  // ------------------------------------------------------------------
  // q56 — J5 station discovery + S7 registry merge: source ids 100..119
  // are absent from the registry (stations S000–S099); merge keeps
  // GREATEST(last_record) per discovered station.
  // ------------------------------------------------------------------
  def q56StationDiscovery(spark: SparkSession, dir: String): DataFrame = {
    val records = parsedRecords(spark, dir)
    val registry = graft.weather.WeatherSynth.stations(spark, dir)
      .select(substring(col("station_id"), 2, 10).cast("long").as("source_id"))
    val discovered = Ingest.discoverStations(records, registry)
    records.join(discovered, "source_id")
      .groupBy(col("source_id"))
      .agg(date_trunc("second", max(col("timestamp"))).as("last_record_date"),
        count(lit(1)).as("n_records"))
      .orderBy(col("source_id"))
  }

  val q56Sql: String =
    s"""WITH $weatherJsonSqlCte,
       |records AS (
       |  SELECT strptime(json_extract_string(payload, '$$.timestamp'), '%Y-%m-%dT%H:%M:%SZ') AS timestamp,
       |    CAST(json_extract_string(payload, '$$.source_id') AS BIGINT) AS source_id
       |  FROM wx),
       |registry AS (SELECT CAST(c_custkey AS BIGINT) AS source_id FROM customer WHERE c_custkey < 100),
       |discovered AS (
       |  SELECT DISTINCT source_id FROM records r
       |  WHERE NOT EXISTS (SELECT 1 FROM registry g WHERE g.source_id = r.source_id))
       |SELECT r.source_id,
       |  CAST(date_trunc('second', MAX(r.timestamp)) AS TIMESTAMP) AS last_record_date,
       |  CAST(COUNT(*) AS BIGINT) AS n_records
       |FROM records r JOIN discovered d USING (source_id)
       |GROUP BY r.source_id
       |ORDER BY r.source_id""".stripMargin

  // ------------------------------------------------------------------
  // q58 — S4 GeoJSON loader: build a MultiPolygon per postal region
  // (square ring around the nation-derived centroid, closed), parse it
  // through the real from_json nested-array path, and average the ring
  // back to a centroid. The DuckDB oracle computes the same centroid from
  // the shared derivation directly — the gate checks results, the Spark
  // side exercises the parsing mechanism.
  // ------------------------------------------------------------------
  def q58GeojsonCentroids(spark: SparkSession, dir: String): DataFrame = {
    val base = graft.weather.WeatherSynth.postalCodes(spark, dir)
    def vertex(dLat: String, dLon: String): org.apache.spark.sql.Column =
      concat(lit("["), (col("centroid_lon") + expr(dLon)).cast("string"),
        lit(","), (col("centroid_lat") + expr(dLat)).cast("string"), lit("]"))
    val payload = base.select(
      col("postal_code"),
      concat(lit("{\"type\":\"MultiPolygon\",\"coordinates\":[[["),
        vertex("-0.125", "-0.25"), lit(","),
        vertex("-0.125", "0.25"), lit(","),
        vertex("0.125", "0.25"), lit(","),
        vertex("0.125", "-0.25"), lit(","),
        vertex("-0.125", "-0.25"), // closing vertex
        lit("]]]}")).as("geometry_geojson"))
    Ingest.parseGeoJsonCentroids(payload, "geometry_geojson")
      .select(col("postal_code"), col("centroid_lat"), col("centroid_lon"))
      .orderBy(col("postal_code"))
  }

  /** Oracle: same square-ring average from the shared derivation. The
    * vertex offsets (±0.125, ±0.25) are binary-exact, so the ring average
    * reproduces the base centroid arithmetic bit-for-bit.
    */
  val q58Sql: String =
    """WITH postal AS (
      |  SELECT '1' || lpad(CAST(n_nationkey AS VARCHAR),4,'0') AS postal_code,
      |         52.0 + (n_nationkey % 10)/5.0 AS centroid_lat,
      |         12.5 + ((n_nationkey*3) % 18)/5.0 AS centroid_lon
      |  FROM nation)
      |SELECT postal_code,
      |  (((centroid_lat - 0.125) + (centroid_lat - 0.125)) + (centroid_lat + 0.125) + (centroid_lat + 0.125))/4 AS centroid_lat,
      |  (((centroid_lon - 0.25) + (centroid_lon + 0.25)) + (centroid_lon + 0.25) + (centroid_lon - 0.25))/4 AS centroid_lon
      |FROM postal
      |ORDER BY postal_code""".stripMargin

  /** q105: the composed incremental transform — two mid-day-straddling
    * slices each driven through incremental bronze merge + gold refresh
    * of exactly the touched days ([[graft.sources.IncrementalGold]]).
    * Oracle: the wholesale daily aggregate over the raw feed — slice-wise
    * refresh must be indistinguishable from recomputing the table. */
  def q105IncrGold(spark: SparkSession, dir: String): DataFrame =
    graft.sources.IncrementalGold.runIncrementalGoldOnce(spark, dir)
      .orderBy(col("event_date"), col("event_type"))

  val q105Sql: String =
    """SELECT CAST(ts AS DATE) AS event_date, event_type,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q55_ingest_parse"      -> (q55IngestParse _),
    "q56_station_discovery" -> (q56StationDiscovery _),
    "q58_geojson_centroids" -> (q58GeojsonCentroids _),
    "q105_incr_gold"        -> (q105IncrGold _),
  )

  val oracleSql: Map[String, String] = Map(
    "q55_ingest_parse"      -> q55Sql,
    "q56_station_discovery" -> q56Sql,
    "q58_geojson_centroids" -> q58Sql,
    "q105_incr_gold"        -> q105Sql,
  )
}
