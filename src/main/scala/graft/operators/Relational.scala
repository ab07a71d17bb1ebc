package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** The reference's relational operator inventory (SURVEY.md §2) re-expressed
  * as idiomatic DataFrame pipelines over the driver corpus, each paired with
  * an ANSI-SQL oracle (DuckDB) in [[Relational.oracleSql]].
  *
  * Cross-engine determinism rules used throughout (so result hashes match
  * the oracle bit-for-bit):
  *   - sums/avgs of 2-decimal source doubles go through DECIMAL(18,2) casts
  *     (exact, order-independent), converted to DOUBLE only at the end;
  *   - derived-double aggregates are rounded via integer-scale rounding
  *     (`round(x*10^d)/10^d`, see [[graft.weather.WeatherPipeline.roundSafe]])
  *     — Spark's BigDecimal HALF_UP and DuckDB's binary rounding agree at
  *     scale 0 but can differ at fractional scales (2.675 → 2.68 vs 2.67);
  *   - predicates never sit on library-function outputs (trig etc.), only on
  *     +,-,*,/ arithmetic which is IEEE-deterministic across engines;
  *   - every query ends with an ORDER BY on integer/string keys.
  */
object Relational {

  private val AsOf = "2024-01-31 00:00:00" // events span Jan 2024 at every SF

  private def dec(c: Column): Column = c.cast("decimal(18,2)")

  // ------------------------------------------------------------------
  // q01 — A2/A4/A5/A6: grouped rollup with min/max/avg/count + HAVING.
  // Mirrors the reference's hourly_aggregates shape
  // (reference src/transformation/aggregation.py:112-153) on lineitem.
  // ------------------------------------------------------------------
  def q01PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast("date"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        (sum(dec(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        count(lit(1)).as("n_rows"))
      .filter(col("n_rows") >= 1) // HAVING COUNT(*) >= 1 parity (aggregation.py:153)
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q01Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  MIN(l_extendedprice) AS min_price,
      |  MAX(l_extendedprice) AS max_price,
      |  CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
      |  CAST(COUNT(*) AS BIGINT) AS n_rows
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |HAVING COUNT(*) >= 1
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ------------------------------------------------------------------
  // q02 — S11/F10/F8: projection + range predicates; filters and the
  // 2-column read schema must reach the parquet scan (PushedFilters).
  // ------------------------------------------------------------------
  def q02FilterProject(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.filter(col("l_quantity").between(10, 20) && col("l_discount") >= 0.05)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_discount"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  val q02Sql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_discount
      |FROM lineitem
      |WHERE l_quantity BETWEEN 10 AND 20 AND l_discount >= 0.05
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  // ------------------------------------------------------------------
  // q03 — F1: time-window filter with an explicit asOf instead of NOW()
  // (reference cleaning.py:50-53; determinism per SURVEY §7 risk 1).
  // Reads through the shared per-JVM bronze landing (168h window ⊇ this
  // 72h one, same AsOf): the raw feed's ns→µs conversion blocks pushdown,
  // while the landed µs ts makes this filter a row-group prune plus an
  // event_date partition prune — the same fix WeatherBronzeSpec pins for
  // the flagship, applied to the last time-filtered events scan.
  // ------------------------------------------------------------------
  def q03TimeWindow(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.weather.WeatherQueries.bronzeEventsWindowed(spark, dir)
    ev.filter(col("ts") >= lit(AsOf).cast("timestamp") - expr("INTERVAL 72 HOURS"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("event_type"))
  }

  val q03Sql: String =
    s"""SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
       |FROM events
       |WHERE ts >= TIMESTAMP '$AsOf' - INTERVAL 72 HOURS
       |GROUP BY event_type
       |ORDER BY event_type""".stripMargin

  // ------------------------------------------------------------------
  // q04 — F2: completeness filter — drop rows where >1 of 3 critical
  // fields is missing (reference cleaning.py:144-149). The corpus has no
  // NULLs, so missingness is synthesized deterministically first.
  // ------------------------------------------------------------------
  def q04Completeness(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val t = when(col("event_id") % 13 === 0, lit(null)).otherwise(col("value"))
    val w = when(col("event_id") % 11 === 0, lit(null)).otherwise(col("value") / 3.0)
    val p = when(col("event_id") % 7 === 0, lit(null)).otherwise(col("value") / 20.0)
    val missing = t.isNull.cast("int") + w.isNull.cast("int") + p.isNull.cast("int")
    ev.select(col("event_id"), col("event_type"), missing.as("n_missing"))
      .filter(col("n_missing") <= 1)
      .groupBy(col("event_type"), col("n_missing"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("event_type"), col("n_missing"))
  }

  val q04Sql: String =
    """WITH flagged AS (
      |  SELECT event_id, event_type,
      |    (CASE WHEN event_id % 13 = 0 THEN 1 ELSE 0 END
      |   + CASE WHEN event_id % 11 = 0 THEN 1 ELSE 0 END
      |   + CASE WHEN event_id % 7 = 0 THEN 1 ELSE 0 END) AS n_missing
      |  FROM events)
      |SELECT event_type, n_missing, CAST(COUNT(*) AS BIGINT) AS n
      |FROM flagged WHERE n_missing <= 1
      |GROUP BY event_type, n_missing
      |ORDER BY event_type, n_missing""".stripMargin

  // ------------------------------------------------------------------
  // q05 — F9: regex predicate (reference load_postal_codes_berlin.py:23-24).
  // ------------------------------------------------------------------
  def q05RegexFilter(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    docs.filter(col("source").rlike("^src1[0-9]$"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
      .orderBy(col("source"))
  }

  val q05Sql: String =
    """SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
      |FROM documents
      |WHERE regexp_matches(source, '^src1[0-9]$')
      |GROUP BY source
      |ORDER BY source""".stripMargin

  // ------------------------------------------------------------------
  // q06 — J1: small-dimension equi join (reference aggregation.py:68 —
  // stations table is tiny). NO explicit broadcast hint: supplier GROWS
  // with SF, so the hint that is harmless here would force an OOM-sized
  // broadcast at 100×. The optimizer broadcasts from parquet size stats
  // while supplier fits the threshold and degrades to a sort-merge join
  // once it doesn't — RegimeSpec proves both regimes produce this exact
  // result. (Hard hints are reserved for dims whose size is bounded BY
  // CONSTRUCTION, e.g. nation = 25 rows forever in q35.)
  // ------------------------------------------------------------------
  def q06BroadcastJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val sup = Tables.supplier(spark, dir)
    li.join(sup, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(dec(col("l_extendedprice"))).cast("double").as("revenue"))
      .orderBy(col("s_name"))
  }

  val q06Sql: String =
    """SELECT s_name, CAST(COUNT(*) AS BIGINT) AS n_items,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |GROUP BY s_name
      |ORDER BY s_name""".stripMargin

  // ------------------------------------------------------------------
  // q07 — J5: anti join (station discovery, reference stations.py:101-118).
  // Customers that have never placed an order.
  // ------------------------------------------------------------------
  def q07AntiJoin(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val recent = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("2000-01-01").cast("date"))
    cust.join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  val q07Sql: String =
    """SELECT c_custkey, c_name, c_mktsegment
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |  AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
      |ORDER BY c_custkey""".stripMargin

  // ------------------------------------------------------------------
  // q08 — J6: semi join (existing-station check, reference
  // observations.py:85-91 — SQL ANY + Python set diff folded into one op).
  // ------------------------------------------------------------------
  def q08SemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(spark, dir)
    val li = Tables.lineitem(spark, dir)
    part.join(li, col("p_partkey") === col("l_partkey"), "left_semi")
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_parts"))
      .orderBy(col("p_brand"))
  }

  val q08Sql: String =
    """SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_parts
      |FROM part
      |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
      |GROUP BY p_brand
      |ORDER BY p_brand""".stripMargin

  // ------------------------------------------------------------------
  // q09 — J4/A7/W2: scalar-max cross join — latest-snapshot semantics of
  // v_latest_observations (reference sql/schema.sql:312-328): keep rows in
  // the max hour.
  // ------------------------------------------------------------------
  def q09LatestSnapshot(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .withColumn("hour", date_trunc("hour", col("ts")))
    val maxHour = ev.agg(max(col("hour")).as("max_hour"))
    ev.crossJoin(broadcast(maxHour))
      .filter(col("hour") === col("max_hour"))
      .select(col("event_id"), col("user_id"), col("event_type"), col("hour"))
      .orderBy(col("event_id"))
  }

  val q09Sql: String =
    """WITH ev AS (SELECT *, date_trunc('hour', ts) AS hour FROM events),
      |m AS (SELECT MAX(hour) AS max_hour FROM ev)
      |SELECT event_id, user_id, event_type, hour
      |FROM ev CROSS JOIN m
      |WHERE hour = max_hour
      |ORDER BY event_id""".stripMargin

  // ------------------------------------------------------------------
  // q10 — J3/A9: as-of-tolerance join + MAE error metrics (reference
  // sql/schema.sql:410-427): lineitems shipped within 90 days of their
  // order date; per-order absolute price error vs the order total.
  // ------------------------------------------------------------------
  def q10AsofMae(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val ord = Tables.orders(spark, dir)
    li.join(ord, col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") >= col("o_orderdate") &&
        col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 90 DAYS"))
      .groupBy(col("o_orderkey"), col("o_totalprice"))
      .agg(sum(dec(col("l_extendedprice"))).as("li_sum"))
      .select(
        col("o_orderkey"),
        abs(dec(col("o_totalprice")) - col("li_sum")).cast("double").as("price_error"),
        (unix_timestamp(lit(AsOf).cast("timestamp")) / lit(3600.0)).as("epoch_hours"))
      .orderBy(col("o_orderkey"))
  }

  val q10Sql: String =
    s"""SELECT o_orderkey,
       |  CAST(ABS(CAST(o_totalprice AS DECIMAL(18,2)) - li_sum) AS DOUBLE) AS price_error,
       |  epoch(TIMESTAMP '$AsOf') / 3600.0 AS epoch_hours
       |FROM (
       |  SELECT o_orderkey, o_totalprice,
       |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS li_sum
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |    AND l_shipdate >= o_orderdate
       |    AND l_shipdate <= o_orderdate + INTERVAL 90 DAY
       |  GROUP BY o_orderkey, o_totalprice)
       |ORDER BY o_orderkey""".stripMargin

  // ------------------------------------------------------------------
  // q11 — W1: LAG temporal-consistency check (reference cleaning.py:348-364)
  // — per user, flag consecutive events <=1h apart whose value jumps by
  // more than 200; return per-user issue counts (count > 0 only).
  // ------------------------------------------------------------------
  def q11LagConsistency(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    ev.withColumn("prev_value", lag(col("value"), 1).over(w))
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .filter(col("prev_value").isNotNull &&
        abs(col("value") - col("prev_value")) > 200 &&
        (unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts"))) <= 3600)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_issues"))
      .orderBy(col("user_id"))
  }

  val q11Sql: String =
    """WITH lagged AS (
      |  SELECT user_id, ts, value,
      |    LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
      |    LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      |  FROM events)
      |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_issues
      |FROM lagged
      |WHERE prev_value IS NOT NULL AND ABS(value - prev_value) > 200
      |  AND epoch(date_trunc('second', ts)) - epoch(date_trunc('second', prev_ts)) <= 3600
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  // ------------------------------------------------------------------
  // q12 — W2/O1: latest-per-key top-1 via row_number (reference
  // weather.py:91-92), deterministic tie-break on event_id.
  // ------------------------------------------------------------------
  def q12LatestPerKey(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    ev.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("event_type"),
        date_trunc("second", col("ts")).as("ts_sec"))
      .orderBy(col("user_id"))
  }

  val q12Sql: String =
    """SELECT user_id, event_id, event_type, CAST(date_trunc('second', ts) AS TIMESTAMP) AS ts_sec
      |FROM (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events)
      |WHERE rn = 1
      |ORDER BY user_id""".stripMargin

  // ------------------------------------------------------------------
  // q13 — O1/O2: ORDER BY + LIMIT with separate window/limit params
  // (fixing reference weather.py:50-51's double-duty `hours`, SURVEY §8 Q12).
  // ------------------------------------------------------------------
  def q13TopK(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
    ord.filter(col("o_orderdate") >= lit("1998-01-01").cast("date"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(50)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("o_orderdate"))
      .orderBy(col("o_orderkey"))
  }

  val q13Sql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate FROM (
      |  SELECT * FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
      |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 50)
      |ORDER BY o_orderkey""".stripMargin

  // ------------------------------------------------------------------
  // q14 — U1: UNION ALL 3-layer status report (reference README.md:144-153).
  // ------------------------------------------------------------------
  def q14UnionReport(spark: SparkSession, dir: String): DataFrame = {
    def layer(name: String, df: DataFrame, key: String) =
      df.agg(count(lit(1)).as("n_rows"), countDistinct(col(key)).as("n_keys"))
        .select(lit(name).as("layer"), col("n_rows"), col("n_keys"))
    layer("bronze_events", Tables.events(spark, dir), "user_id")
      .union(layer("silver_orders", Tables.orders(spark, dir), "o_custkey"))
      .union(layer("gold_lineitem", Tables.lineitem(spark, dir), "l_orderkey"))
      .orderBy(col("layer"))
  }

  val q14Sql: String =
    """SELECT * FROM (
      |  SELECT 'bronze_events' AS layer, CAST(COUNT(*) AS BIGINT) AS n_rows,
      |    CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_keys FROM events
      |  UNION ALL
      |  SELECT 'silver_orders', CAST(COUNT(*) AS BIGINT),
      |    CAST(COUNT(DISTINCT o_custkey) AS BIGINT) FROM orders
      |  UNION ALL
      |  SELECT 'gold_lineitem', CAST(COUNT(*) AS BIGINT),
      |    CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) FROM lineitem)
      |ORDER BY layer""".stripMargin

  // ------------------------------------------------------------------
  // q15 — A8: conditional counts, COUNT(*) FILTER (reference
  // transform.py:217-224) per day.
  // ------------------------------------------------------------------
  def q15ConditionalCounts(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    ev.groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(
        count(lit(1)).as("n"),
        count(when(col("event_type") === "error", 1)).as("n_errors"),
        count(when(col("value") > 400, 1)).as("n_big"),
        count(when(col("event_id") % 13 === 0, 1)).as("n_null_temp"))
      .orderBy(col("day"))
  }

  val q15Sql: String =
    """SELECT date_trunc('day', ts) AS day,
      |  CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS n_errors,
      |  CAST(COUNT(*) FILTER (WHERE value > 400) AS BIGINT) AS n_big,
      |  CAST(COUNT(*) FILTER (WHERE event_id % 13 = 0) AS BIGINT) AS n_null_temp
      |FROM events
      |GROUP BY 1
      |ORDER BY day""".stripMargin

  // ------------------------------------------------------------------
  // q16 — scalar-function surface: datetime/math/string/conditional
  // (SURVEY §2.8) exercised per-row, then aggregated.
  // ------------------------------------------------------------------
  def q16ScalarFunctions(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    ev.select(
        col("event_id"),
        col("event_type"),
        (unix_timestamp(date_trunc("hour", col("ts"))) / 3600).cast("long").as("epoch_hour"),
        abs(col("value") - 250).as("abs_dev"),
        least(col("value"), lit(100.0)).as("capped"),
        greatest(col("value"), lit(1.0)).as("floored"),
        coalesce(nullif(col("event_type"), lit("error")), lit("ERR")).as("routed"),
        concat(lit("u"), col("user_id").cast("string"), lit(":"), col("event_type")).as("tag"))
      .groupBy(col("routed"))
      .agg(
        count(lit(1)).as("n"),
        min(col("epoch_hour")).as("min_hour"),
        max(col("abs_dev")).as("max_dev"),
        min(col("capped")).as("min_capped"),
        max(col("floored")).as("max_floored"),
        max(col("tag")).as("max_tag"))
      .orderBy(col("routed"))
  }

  val q16Sql: String =
    """WITH s AS (
      |  SELECT event_id, event_type,
      |    CAST(epoch(date_trunc('hour', ts)) / 3600 AS BIGINT) AS epoch_hour,
      |    ABS(value - 250) AS abs_dev,
      |    LEAST(value, 100.0) AS capped,
      |    GREATEST(value, 1.0) AS floored,
      |    COALESCE(NULLIF(event_type, 'error'), 'ERR') AS routed,
      |    'u' || CAST(user_id AS VARCHAR) || ':' || event_type AS tag
      |  FROM events)
      |SELECT routed, CAST(COUNT(*) AS BIGINT) AS n,
      |  MIN(epoch_hour) AS min_hour, MAX(abs_dev) AS max_dev,
      |  MIN(capped) AS min_capped, MAX(floored) AS max_floored, MAX(tag) AS max_tag
      |FROM s GROUP BY routed ORDER BY routed""".stripMargin

  // ------------------------------------------------------------------
  // q17 — JSON extraction (reference brightsky_client.py:58,77-92 parses
  // JSON payloads): pull props.k out of the events JSON column.
  // ------------------------------------------------------------------
  def q17JsonExtract(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    ev.select(get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy((col("k") % 10).as("k_mod"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
      .orderBy(col("k_mod"))
  }

  val q17Sql: String =
    """WITH j AS (SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k FROM events)
      |SELECT k % 10 AS k_mod, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(k) AS BIGINT) AS sum_k
      |FROM j GROUP BY 1 ORDER BY k_mod""".stripMargin

  // ------------------------------------------------------------------
  // q18 — upsert semantics as a query (S5: last-write-wins on
  // (station,ts) — reference observations.py:258-283): re-ingesting the
  // same batch with bumped update priority keeps exactly the newer copy.
  // ------------------------------------------------------------------
  def q18UpsertLastWins(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val first = ev.select(col("event_id"), col("user_id"), col("value"), lit(1).as("version"))
    val second = ev.filter(col("event_id") % 3 === 0)
      .select(col("event_id"), col("user_id"), (col("value") + 1000).as("value"), lit(2).as("version"))
    val unioned = first.union(second)
    val w = Window.partitionBy(col("event_id")).orderBy(col("version").desc)
    unioned.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("value"))).cast("double").as("sum_value"),
        max(col("version")).as("max_version"))
      .orderBy(col("user_id"))
  }

  val q18Sql: String =
    """WITH unioned AS (
      |  SELECT event_id, user_id, value, 1 AS version FROM events
      |  UNION ALL
      |  SELECT event_id, user_id, value + 1000, 2 FROM events WHERE event_id % 3 = 0),
      |dedup AS (
      |  SELECT * FROM (
      |    SELECT *, ROW_NUMBER() OVER (PARTITION BY event_id ORDER BY version DESC) AS rn
      |    FROM unioned) WHERE rn = 1)
      |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
      |  CAST(MAX(version) AS INT) AS max_version
      |FROM dedup GROUP BY user_id ORDER BY user_id""".stripMargin

  // ------------------------------------------------------------------
  // q19 — upsert S6: first-write-wins (forecasts, reference
  // forecasts.py:233-243 ON CONFLICT DO NOTHING) via left-anti append.
  // ------------------------------------------------------------------
  def q19UpsertFirstWins(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val existing = ev.filter(col("event_id") % 2 === 0)
      .select(col("event_id"), col("value"))
    val incoming = ev.filter(col("event_id") % 3 === 0)
      .select(col("event_id"), (col("value") + 5000).as("value"))
    val appended = incoming.join(existing, Seq("event_id"), "left_anti")
    existing.union(appended)
      .agg(count(lit(1)).as("n"),
        sum(dec(col("value"))).cast("double").as("sum_value"))
      .select(lit("merged").as("k"), col("n"), col("sum_value"))
  }

  val q19Sql: String =
    """WITH existing AS (SELECT event_id, value FROM events WHERE event_id % 2 = 0),
      |incoming AS (SELECT event_id, value + 5000 AS value FROM events WHERE event_id % 3 = 0),
      |appended AS (SELECT * FROM incoming i WHERE NOT EXISTS
      |  (SELECT 1 FROM existing e WHERE e.event_id = i.event_id)),
      |merged AS (SELECT * FROM existing UNION ALL SELECT * FROM appended)
      |SELECT 'merged' AS k, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM merged""".stripMargin

  // ------------------------------------------------------------------
  // q30 — array surface (SURVEY §2.8: ArrayType columns, array_contains /
  // isin / distinct / sort / slice / join) over tokenized documents.
  // ------------------------------------------------------------------
  def q30ArrayOps(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .withColumn("toks", split(trim(col("text")), "\\s+"))
    docs.select(
        col("doc_id"),
        size(col("toks")).as("n_toks"),
        size(array_distinct(col("toks"))).as("n_uniq"),
        array_contains(col("toks"), "spark").as("has_spark"),
        col("lang").isin("en", "de").as("lang_eu"),
        element_at(sort_array(col("toks")), 1).as("first_tok"),
        array_join(slice(sort_array(array_distinct(col("toks"))), 1, 3), ",").as("top3"))
      .groupBy(col("has_spark"), col("lang_eu"))
      .agg(count(lit(1)).as("n"), sum(col("n_toks")).as("sum_toks"),
        sum(col("n_uniq")).as("sum_uniq"),
        min(col("first_tok")).as("min_first"), max(col("top3")).as("max_top3"))
      .orderBy(col("has_spark"), col("lang_eu"))
  }

  val q30Sql: String =
    """WITH t AS (
      |  SELECT doc_id,
      |    CAST(len(toks) AS INT) AS n_toks,
      |    CAST(len(list_distinct(toks)) AS INT) AS n_uniq,
      |    list_contains(toks, 'spark') AS has_spark,
      |    lang IN ('en','de') AS lang_eu,
      |    list_sort(toks)[1] AS first_tok,
      |    array_to_string(list_sort(list_distinct(toks))[1:3], ',') AS top3
      |  FROM (SELECT doc_id, lang, regexp_split_to_array(trim(text), '\s+') AS toks
      |        FROM documents))
      |SELECT has_spark, lang_eu, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(n_toks) AS BIGINT) AS sum_toks,
      |  CAST(SUM(n_uniq) AS BIGINT) AS sum_uniq,
      |  MIN(first_tok) AS min_first, MAX(top3) AS max_top3
      |FROM t GROUP BY has_spark, lang_eu
      |ORDER BY has_spark, lang_eu""".stripMargin

  // ------------------------------------------------------------------
  // q33 — percentiles/median (beyond the reference — no percentile exists
  // there, SURVEY §2.4): exact interpolated percentiles per group. Both
  // engines interpolate as a + frac*(b-a) over the sorted group.
  // ------------------------------------------------------------------
  def q33Percentiles(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_extendedprice, 0.5)").as("p50"),
        expr("percentile(l_extendedprice, 0.9)").as("p90"),
        expr("percentile(l_quantity, 0.25)").as("q25"))
      .orderBy(col("l_returnflag"))
  }

  val q33Sql: String =
    """SELECT l_returnflag,
      |  quantile_cont(l_extendedprice, 0.5) AS p50,
      |  quantile_cont(l_extendedprice, 0.9) AS p90,
      |  quantile_cont(l_quantity, 0.25) AS q25
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  // ------------------------------------------------------------------
  // q34 — approx_count_distinct (HLL++): the at-scale substitute for the
  // exact countDistincts used elsewhere. Sketch estimates are
  // engine-specific, so the oracled contract is the tolerance itself:
  // emit exact counts plus `approx_*_ok = |approx − exact| / exact ≤ 0.05`
  // (HLL++ at rsd 0.02), which the oracle asserts as literal TRUE —
  // putting the ±5% guarantee inside the hash gate. ApproxSpec bounds the
  // raw estimates as well.
  // ------------------------------------------------------------------
  def q34ApproxDistinct(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    ev.groupBy(col("event_type"))
      .agg(
        countDistinct(col("user_id")).as("exact_users"),
        countDistinct(col("event_id")).as("exact_events"),
        approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
        approx_count_distinct(col("event_id"), 0.02).as("approx_events"))
      .select(col("event_type"), col("exact_users"), col("exact_events"),
        (abs(col("approx_users") - col("exact_users")).cast("double") / col("exact_users") <= 0.05)
          .cast("int").as("approx_users_ok"),
        (abs(col("approx_events") - col("exact_events")).cast("double") / col("exact_events") <= 0.05)
          .cast("int").as("approx_events_ok"))
      .orderBy(col("event_type"))
  }

  val q34Sql: String =
    """SELECT event_type,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
      |  CAST(COUNT(DISTINCT event_id) AS BIGINT) AS exact_events,
      |  1 AS approx_users_ok, 1 AS approx_events_ok
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ------------------------------------------------------------------
  // q35 — 4-table join chain (lineitem ⋈ orders ⋈ customer ⋈ nation):
  // Catalyst join reordering + broadcast of the small dims; revenue by
  // nation and year.
  // ------------------------------------------------------------------
  def q35MultiJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val ord = Tables.orders(spark, dir)
    val cust = Tables.customer(spark, dir)
    val nat = Tables.nation(spark, dir)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), year(col("o_orderdate")).as("order_year"))
      .agg(
        sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("n_name"), col("order_year"))
  }

  val q35Sql: String =
    """SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS order_year,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |  CAST(COUNT(*) AS BIGINT) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name, year(o_orderdate)
      |ORDER BY n_name, order_year""".stripMargin

  // ------------------------------------------------------------------
  // q36 — window frames beyond the reference's plain LAG (SURVEY §2.5):
  // running sum (rows unbounded-preceding..current), lead, and ntile over
  // a fully-determined ordering.
  // ------------------------------------------------------------------
  def q36WindowFrames(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    ev.withColumn("running_value",
        sum(dec(col("value"))).over(w.rowsBetween(Window.unboundedPreceding, 0))
          .cast("double"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .withColumn("quartile", ntile(4).over(w))
      .filter(col("user_id") < 20)
      .select(col("user_id"), col("event_id"), col("running_value"),
        col("next_type"), col("quartile"))
      .orderBy(col("user_id"), col("event_id"))
  }

  val q36Sql: String =
    """SELECT user_id, event_id,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
      |    PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value,
      |  LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type,
      |  CAST(NTILE(4) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INT) AS quartile
      |FROM events
      |WHERE user_id < 20
      |ORDER BY user_id, event_id""".stripMargin

  // ------------------------------------------------------------------
  // q60 — set operations beyond the reference's UNION ALL (SURVEY §2.7):
  // INTERSECT and EXCEPT with SQL distinct semantics.
  // ------------------------------------------------------------------
  def q60SetOps(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val purchasers = ev.filter(col("event_type") === "purchase").select(col("user_id"))
    val errorers = ev.filter(col("event_type") === "error").select(col("user_id"))
    val both = purchasers.intersect(errorers)
      .select(lit("purchase_and_error").as("cohort"), col("user_id"))
    val onlyPurchase = purchasers.except(errorers)
      .select(lit("purchase_only").as("cohort"), col("user_id"))
    both.union(onlyPurchase).orderBy(col("cohort"), col("user_id"))
  }

  val q60Sql: String =
    """SELECT * FROM (
      |  SELECT 'purchase_and_error' AS cohort, user_id FROM (
      |    SELECT user_id FROM events WHERE event_type = 'purchase'
      |    INTERSECT
      |    SELECT user_id FROM events WHERE event_type = 'error')
      |  UNION ALL
      |  SELECT 'purchase_only', user_id FROM (
      |    SELECT user_id FROM events WHERE event_type = 'purchase'
      |    EXCEPT
      |    SELECT user_id FROM events WHERE event_type = 'error'))
      |ORDER BY cohort, user_id""".stripMargin

  // ------------------------------------------------------------------
  // q61 — ROLLUP subtotals (absent from the reference, SURVEY §2.4 "no
  // grouping sets/cube/rollup"): per-(flag,status), per-flag, and grand
  // totals in one pass, decimal-exact sums.
  // ------------------------------------------------------------------
  def q61Rollup(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
  }

  val q61Sql: String =
    """SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  // ------------------------------------------------------------------
  // q67 — salted skew join as a first-class query: lineitem ⋈ supplier
  // with the big side salted 8 ways ([[graft.functions.SkewJoin]]), then
  // the per-supplier rollup. The oracle is the PLAIN join — salting must
  // be result-invisible, and hashing it against an unsalted engine proves
  // exactly that. (At 100 TB this is the manual fallback when one hot key
  // dwarfs AQE's skew-split granularity, e.g. bucketed inputs.)
  // ------------------------------------------------------------------
  def q67SaltedJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).withColumnRenamed("l_suppkey", "s_suppkey")
    val sup = Tables.supplier(spark, dir).select("s_suppkey", "s_name")
    graft.functions.SkewJoin.saltedEquiJoin(li, sup,
        keys = Seq("s_suppkey"), salts = 8, saltOn = Seq("l_orderkey", "l_linenumber"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"))
      .orderBy(col("s_name"))
  }

  val q67Sql: String =
    """SELECT s_name, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |GROUP BY s_name ORDER BY s_name""".stripMargin

  // ------------------------------------------------------------------
  // q68 — binned range join ([[RangeJoin]]): events into 6-hour
  // maintenance windows derived from nation (25 intervals, one every
  // 28 h), aggregated per window. The oracle is the naive BETWEEN join —
  // hash equality proves the binning loses/duplicates nothing. µs
  // discipline: the oracle casts the ns feed to µs before comparing,
  // matching Spark's read-side floor (whole-hour bounds sit exactly on
  // the boundary otherwise).
  // ------------------------------------------------------------------
  def q68RangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val intervals = Tables.nation(spark, dir).select(
      col("n_nationkey").as("window_id"),
      expr("timestamp'2024-01-01 00:00:00' + make_interval(0, 0, 0, 0, n_nationkey * 28, 0, 0)")
        .as("start_ts"),
      expr("timestamp'2024-01-01 00:00:00' + make_interval(0, 0, 0, 0, n_nationkey * 28 + 6, 0, 0)")
        .as("end_ts"))
    RangeJoin.binnedRangeJoin(Tables.events(spark, dir), "ts",
        intervals, "start_ts", "end_ts", binMicros = 6L * 3600 * 1000000)
      .groupBy(col("window_id"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(dec(col("value"))).cast("double").as("sum_value"))
      .orderBy(col("window_id"))
  }

  val q68Sql: String =
    """WITH iv AS (
      |  SELECT n_nationkey AS window_id,
      |    TIMESTAMP '2024-01-01 00:00:00' + n_nationkey * INTERVAL 28 HOUR AS start_ts,
      |    TIMESTAMP '2024-01-01 00:00:00' + (n_nationkey * 28 + 6) * INTERVAL 1 HOUR AS end_ts
      |  FROM nation),
      |e AS (SELECT user_id, value, CAST(ts AS TIMESTAMP) AS ts FROM events)
      |SELECT window_id, CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM e JOIN iv ON e.ts >= iv.start_ts AND e.ts <= iv.end_ts
      |GROUP BY window_id ORDER BY window_id""".stripMargin

  // ------------------------------------------------------------------
  // q69 — approx_percentile with the tolerance contract in the hash
  // (same pattern as q34): the 100 TB substitute for q33's exact
  // percentiles. The oracled claim is the RANK bound: the fraction of
  // rows ≤ the approximate p-quantile must sit in p ± 0.02 (accuracy
  // 10000 ⇒ rank error ≤ n/10000, orders tighter than the band; the
  // band also absorbs value ties). Oracle asserts the flags as literal
  // TRUE plus the exact counts.
  // ------------------------------------------------------------------
  def q69ApproxPercentile(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val ap = ev.groupBy(col("event_type")).agg(
      count(lit(1)).as("n"),
      expr("approx_percentile(value, 0.5, 10000)").as("p50"),
      expr("approx_percentile(value, 0.9, 10000)").as("p90"))
    def okFlag(p: Column, target: Double): Column =
      (abs(sum((col("value") <= p).cast("long")).cast("double") / count(lit(1)) - target)
        <= 0.02).cast("int")
    ev.join(broadcast(ap), "event_type")
      .groupBy(col("event_type"))
      .agg(first(col("n")).as("n"),
        okFlag(col("p50"), 0.5).as("p50_rank_ok"),
        okFlag(col("p90"), 0.9).as("p90_rank_ok"))
      .orderBy(col("event_type"))
  }

  val q69Sql: String =
    """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |  1 AS p50_rank_ok, 1 AS p90_rank_ok
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ------------------------------------------------------------------
  // q74 — pivot (beyond reference): per-user-decile event counts with
  // event_type pivoted to columns. Spark's `pivot` with an explicit value
  // list (no discovery scan); the oracle is conditional aggregation —
  // same relational content, which is the point: pivot is sugar over
  // FILTERed counts, and the hash proves the sugar changes nothing.
  // ------------------------------------------------------------------
  def q74Pivot(spark: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val ev = Tables.events(spark, dir).withColumn("decile", col("user_id") % 10)
    val p = ev.groupBy(col("decile")).pivot("event_type", types).agg(count(lit(1)))
    p.select(col("decile") +: types.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
      .orderBy(col("decile"))
  }

  val q74Sql: String = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val cols = types.map(t =>
      s"CAST(COUNT(*) FILTER (WHERE event_type = '$t') AS BIGINT) AS $t").mkString(",\n  ")
    s"""SELECT user_id % 10 AS decile,
       |  $cols
       |FROM events GROUP BY user_id % 10 ORDER BY decile""".stripMargin
  }

  // ------------------------------------------------------------------
  // q75 — generic as-of feature join ([[AsofJoin]]): each click gets the
  // latest prior view's value for the same user within 2 h — the
  // leak-free "newest signal known at example time" join, built with the
  // union+window construction (ONE shuffle on user_id, no non-equi join
  // explosion). Oracle mirrors the construction with ANSI window
  // functions over µs-cast timestamps; lag is exact integer µs division.
  // ------------------------------------------------------------------
  def q75AsofFeatures(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("vts"), col("value"), col("event_id"))
    AsofJoin.nearestPrior(clicks, views, Seq("user_id"), "ts", "vts",
        payloadCols = Seq("value"), toleranceMicros = Some(2L * 3600 * 1000000),
        rightTieCol = Some("event_id"))
      .select(col("user_id"), col("click_id"),
        col("asof_value"),
        (unix_micros(col("ts")) - unix_micros(col("matched_ts"))).as("lag_us"))
      .orderBy(col("user_id"), col("click_id"))
  }

  val q75Sql: String =
    """WITH e AS (
      |  SELECT event_id, user_id, event_type, value, CAST(ts AS TIMESTAMP) AS ts FROM events),
      |u AS (
      |  SELECT user_id, 1 AS side, ts, 0::BIGINT AS tie,
      |    NULL::STRUCT(rts TIMESTAMP, pval DOUBLE) AS r, event_id
      |  FROM e WHERE event_type = 'click'
      |  UNION ALL
      |  SELECT user_id, 0, ts, event_id,
      |    struct_pack(rts := ts, pval := value), NULL
      |  FROM e WHERE event_type = 'view'),
      |c AS (
      |  -- the right row is carried as ONE struct (atomic), mirroring
      |  -- AsofJoin: separate last_value per column could mix rows when a
      |  -- payload is NULL
      |  SELECT user_id, side, ts, event_id,
      |    last_value(r IGNORE NULLS) OVER w AS cr
      |  FROM u
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, side, tie
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |SELECT user_id, event_id AS click_id,
      |  CASE WHEN cr IS NOT NULL AND epoch_us(ts) - epoch_us(cr.rts) <= 7200000000
      |       THEN cr.pval END AS asof_value,
      |  CASE WHEN cr IS NOT NULL AND epoch_us(ts) - epoch_us(cr.rts) <= 7200000000
      |       THEN epoch_us(ts) - epoch_us(cr.rts) END AS lag_us
      |FROM c WHERE side = 1
      |ORDER BY user_id, click_id""".stripMargin

  // ------------------------------------------------------------------
  // q76 — int8 embedding quantization (max-abs scale, FLOOR quantizer):
  // the storage-side preprocessing for ANN at 100 TB (4× smaller vectors,
  // SIMD-friendly int8 dot products). FLOOR, not round: floor is
  // unambiguous cross-engine, while round's half-way ties differ (HALF_UP
  // vs away-from-zero) — a determinism choice documented in the scaladoc
  // of WeatherPipeline.roundSafe. Per-vector summary output (sum/min/max
  // of the quantized lanes + the scale in 1e-6 units) keeps the oracle
  // row-shaped.
  // ------------------------------------------------------------------
  def q76QuantizeEmbeddings(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .withColumn("v", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
      .withColumn("scale", expr("aggregate(v, 0.0D, (m, x) -> greatest(m, abs(x)))"))
      .withColumn("q", expr("transform(v, x -> CAST(FLOOR(x / scale * 127.0) AS BIGINT))"))
      .select(col("vec_id"), col("label"),
        expr("CAST(FLOOR(scale * 1e6) AS BIGINT)").as("scale_1e6"),
        expr("size(q)").cast("int").as("n_dims"),
        expr("aggregate(q, 0L, (a, x) -> a + x)").as("q_sum"),
        expr("array_min(q)").as("q_min"),
        expr("array_max(q)").as("q_max"))
      .orderBy(col("vec_id"))

  val q76Sql: String =
    """WITH t AS (
      |  SELECT vec_id, label,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |s AS (
      |  SELECT vec_id, label, v,
      |    list_max(list_transform(v, x -> abs(x))) AS scale
      |  FROM t),
      |q AS (
      |  SELECT vec_id, label, scale,
      |    list_transform(v, x -> CAST(FLOOR(x / scale * 127.0) AS BIGINT)) AS qv
      |  FROM s)
      |SELECT vec_id, label,
      |  CAST(FLOOR(scale * 1e6) AS BIGINT) AS scale_1e6,
      |  CAST(len(qv) AS INT) AS n_dims,
      |  CAST(list_sum(qv) AS BIGINT) AS q_sum,
      |  list_min(qv) AS q_min,
      |  list_max(qv) AS q_max
      |FROM q ORDER BY vec_id""".stripMargin

  // ------------------------------------------------------------------
  // q79 — SCD type-2 dimension build: the versioned-history upsert the
  // reference's SCD1 station merge (S7, GREATEST) does NOT keep. Daily
  // per-station readings become validity intervals via lead() —
  // `valid_to` = next version's start minus 1s, open (NULL) for the
  // current row. One window shuffle on the dimension key; the natural
  // storage layout is partition-by-is_current so serving reads never
  // touch history.
  // ------------------------------------------------------------------
  def q79Scd2Dimension(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val updates = ev
      .withColumn("station_id",
        concat(lit("S"), lpad((col("user_id") % 100).cast("string"), 3, "0")))
      .groupBy(col("station_id"), date_trunc("day", col("ts")).as("valid_from"))
      .agg(max(dec(col("value"))).cast("double").as("reading"))
    val w = Window.partitionBy(col("station_id")).orderBy(col("valid_from"))
    updates
      .withColumn("valid_to",
        lead(col("valid_from"), 1).over(w) - expr("INTERVAL 1 SECOND"))
      .withColumn("is_current", lead(col("valid_from"), 1).over(w).isNull.cast("int"))
      .orderBy(col("station_id"), col("valid_from"))
  }

  val q79Sql: String =
    """WITH upd AS (
      |  SELECT 'S' || lpad(CAST(user_id % 100 AS VARCHAR), 3, '0') AS station_id,
      |    date_trunc('day', ts) AS valid_from,
      |    CAST(MAX(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS reading
      |  FROM events GROUP BY 1, 2)
      |SELECT station_id, valid_from, reading,
      |  lead(valid_from) OVER w - INTERVAL 1 SECOND AS valid_to,
      |  CAST(lead(valid_from) OVER w IS NULL AS INT) AS is_current
      |FROM upd
      |WINDOW w AS (PARTITION BY station_id ORDER BY valid_from)
      |ORDER BY station_id, valid_from""".stripMargin

  /** queries + oracles exported to [[graft.SparkEntry]]. */
  // ------------------------------------------------------------------
  // q88 — UNPIVOT (melt): the inverse of q74's pivot, completing the
  // reshaping pair — wide per-flag metric columns back to long
  // (key, metric, value) rows. Spark's Dataset.unpivot plans as the same
  // Expand operator the rollup uses: row-local fan-out, no shuffle
  // beyond the feeding aggregate.
  // ------------------------------------------------------------------
  def q88Unpivot(spark: SparkSession, dir: String): DataFrame = {
    val agg = Tables.lineitem(spark, dir).groupBy(col("l_returnflag"))
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_price"),
        sum(dec(col("l_discount"))).cast("double").as("sum_disc"))
    agg.unpivot(Array(col("l_returnflag")),
        Array(col("sum_qty"), col("sum_price"), col("sum_disc")),
        "metric", "value")
      .orderBy(col("l_returnflag"), col("metric"))
  }

  val q88Sql: String =
    """WITH agg AS (
      |  SELECT l_returnflag,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
      |    CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc
      |  FROM lineitem GROUP BY 1)
      |SELECT l_returnflag, metric, value FROM agg
      |UNPIVOT (value FOR metric IN (sum_qty, sum_price, sum_disc))
      |ORDER BY l_returnflag, metric""".stripMargin

  // ------------------------------------------------------------------
  // q90 — CUBE with GROUPING flags (completes the grouping-sets family
  // next to q61's ROLLUP): all four aggregation levels in one Expand
  // pass, with grouping() markers so subtotal rows are distinguishable
  // from genuine NULL keys — the robust pattern even though these
  // columns happen to be non-null. Same physical shape as rollup: Expand
  // fans each row to its grouping sets, one partial→final aggregate
  // exchange, no extra shuffle.
  // ------------------------------------------------------------------
  def q90Cube(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        grouping(col("l_returnflag")).cast("int").as("g_flag"),
        grouping(col("l_linestatus")).cast("int").as("g_status"))
      .orderBy(col("g_flag"), col("g_status"),
        col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
  }

  val q90Sql: String =
    """SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
      |  CAST(GROUPING(l_linestatus) AS INT) AS g_status
      |FROM lineitem
      |GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY g_flag, g_status,
      |  l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  // ------------------------------------------------------------------
  // q91 — tie-aware ranking family (dense_rank / percent_rank /
  // cume_dist; q36 already covers frames, lead, ntile). Only tie-aware
  // functions appear — their outputs depend on the ORDER BY *values*,
  // never on physical row order within a tie, so results are
  // deterministic under any partitioning. percent_rank/cume_dist are
  // single divisions of exact small ints — IEEE-identical cross-engine
  // unrounded (the q40-ratio rule). row_number over the same ties would
  // be nondeterministic and is deliberately absent.
  // ------------------------------------------------------------------
  def q91RankFunctions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment")).orderBy(col("c_acctbal"))
    Tables.customer(spark, dir)
      .withColumn("bal_dense_rank", dense_rank().over(w))
      .withColumn("bal_percent_rank", percent_rank().over(w))
      .withColumn("bal_cume_dist", cume_dist().over(w))
      .filter(col("c_custkey") % 100 === 0)
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
        col("bal_dense_rank").cast("long").as("bal_dense_rank"),
        col("bal_percent_rank"), col("bal_cume_dist"))
      .orderBy(col("c_custkey"))
  }

  val q91Sql: String =
    """SELECT c_custkey, c_mktsegment, c_acctbal,
      |  CAST(DENSE_RANK() OVER w AS BIGINT) AS bal_dense_rank,
      |  PERCENT_RANK() OVER w AS bal_percent_rank,
      |  CUME_DIST() OVER w AS bal_cume_dist
      |FROM customer
      |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal)
      |QUALIFY c_custkey % 100 = 0
      |ORDER BY c_custkey""".stripMargin

  // ------------------------------------------------------------------
  // q106 — window-free argmax: per group, the row achieving the group
  // maximum, via two partial-aggregable passes (max per group, then an
  // equi-join back at the max + a min tie-break) instead of a
  // row_number window. The window form sorts every group's full row set
  // on one reducer per group; this form ships only per-group scalars
  // through both aggregates and joins against a broadcast-sized max
  // table — at 100 TB the difference between a sort of the table and
  // two map-side-combined passes. Tie-break on min l_orderkey makes the
  // answer deterministic (max_by alone is not, under ties).
  // ------------------------------------------------------------------
  def q106Argmax(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val mx = li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(max(col("l_extendedprice")).as("max_price"))
      .withColumnRenamed("l_returnflag", "rf").withColumnRenamed("l_linestatus", "ls")
    li.join(broadcast(mx),
        col("l_returnflag") === col("rf") && col("l_linestatus") === col("ls") &&
        col("l_extendedprice") === col("max_price"))
      .groupBy(col("rf"), col("ls"), col("max_price"))
      .agg(min(col("l_orderkey")).as("argmax_order"))
      .select(col("rf").as("l_returnflag"), col("ls").as("l_linestatus"),
        col("max_price"), col("argmax_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q106Sql: String =
    """WITH mx AS (
      |  SELECT l_returnflag, l_linestatus, MAX(l_extendedprice) AS max_price
      |  FROM lineitem GROUP BY l_returnflag, l_linestatus)
      |SELECT m.l_returnflag, m.l_linestatus, m.max_price,
      |  MIN(l.l_orderkey) AS argmax_order
      |FROM lineitem l JOIN mx m
      |  ON l.l_returnflag = m.l_returnflag AND l.l_linestatus = m.l_linestatus
      |  AND l.l_extendedprice = m.max_price
      |GROUP BY m.l_returnflag, m.l_linestatus, m.max_price
      |ORDER BY m.l_returnflag, m.l_linestatus""".stripMargin

  // ------------------------------------------------------------------
  // q108 — gap-fill / resample: project each tracked entity onto a
  // regular hourly grid and forward-fill the last observed value across
  // empty hours — the standard metrics/IoT densification every
  // time-series consumer (charting, feature windows, drift monitors)
  // runs before use. Structure: per-(entity,hour) pre-aggregate (the
  // deterministic "last event of the hour" via a ts/event_id-ordered
  // rank), a GENERATED grid (sequence × distinct entities — never a
  // shuffle of the fact), a left join back, and ONE forward-fill window
  // per entity (`last(_, ignoreNulls)` over rows-unbounded-preceding).
  // At 100 TB the grid is entities × hours — orders smaller than the
  // fact — and the only full-data pass is the hourly pre-aggregate,
  // which partial-aggregates map-side. Leading hours before an entity's
  // first event stay NULL (is_gap marks every filled row).
  // ------------------------------------------------------------------
  def q108GapFill(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).filter(col("user_id") % 10 === 0)
    val ranked = ev.withColumn("hour", date_trunc("hour", col("ts")))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("user_id"), col("hour"))
          .orderBy(col("ts").desc, col("event_id").desc)))
    val perHour = ranked.groupBy(col("user_id"), col("hour"))
      .agg(count(lit(1)).as("n_events"),
        max(when(col("__rn") === 1, col("value"))).as("last_value"))
    val bounds = ev.agg(date_trunc("hour", min(col("ts"))).as("lo"),
      date_trunc("hour", max(col("ts"))).as("hi"))
    val grid = ev.select(col("user_id")).distinct()
      .crossJoin(broadcast(bounds))
      .select(col("user_id"),
        explode(sequence(col("lo"), col("hi"), expr("interval 1 hour"))).as("hour"))
    val fill = Window.partitionBy(col("user_id")).orderBy(col("hour"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(perHour, Seq("user_id", "hour"), "left")
      .select(col("user_id"), col("hour"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        last(col("last_value"), ignoreNulls = true).over(fill).as("value_filled"),
        col("n_events").isNull.as("is_gap"))
      .orderBy(col("user_id"), col("hour"))
  }

  val q108Sql: String =
    """WITH ev AS (
      |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value
      |  FROM events WHERE user_id % 10 = 0),
      |per_hour AS (
      |  SELECT user_id, date_trunc('hour', ts) AS hour, COUNT(*) AS n_events,
      |    MAX(CASE WHEN rn = 1 THEN value END) AS last_value
      |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('hour', ts)
      |          ORDER BY ts DESC, event_id DESC) AS rn FROM ev)
      |  GROUP BY 1, 2),
      |b AS (SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi FROM ev),
      |grid AS (
      |  SELECT u.user_id, g.hour
      |  FROM (SELECT DISTINCT user_id FROM ev) u,
      |       (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour FROM b) g)
      |SELECT g.user_id, g.hour,
      |  CAST(COALESCE(p.n_events, 0) AS BIGINT) AS n_events,
      |  LAST_VALUE(p.last_value IGNORE NULLS) OVER (PARTITION BY g.user_id ORDER BY g.hour
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_filled,
      |  p.n_events IS NULL AS is_gap
      |FROM grid g LEFT JOIN per_hour p ON g.user_id = p.user_id AND g.hour = p.hour
      |ORDER BY g.user_id, g.hour""".stripMargin

  // ------------------------------------------------------------------
  // q109 — referential-integrity audit: per-FK orphan counts and rates
  // for the fact's three dimension keys. A Parquet lake has no FK
  // constraints (the reference leans on declared FKs + composite indexes,
  // `sql/schema.sql`), so integrity is a QUERY: left-anti probes of the
  // fact against each dimension's key set. Each probe broadcasts the
  // dim-key projection (keys only, never payload) — at 100 TB dims that
  // outgrow broadcast use the bloom runtime filter (RuntimeFilterSpec)
  // or a shuffle anti-join; the fact is scanned once for the total and
  // once per FK with only the key column read (column pruning). Rates
  // are single divisions of
  // exact counts. This is the post-land gate an ingest pipeline runs
  // before promoting bronze to silver.
  // ------------------------------------------------------------------
  def q109FkAudit(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    // the total is the same for all three audits: materialize the 1-row
    // count ONCE (localCheckpoint, harness-swept) instead of letting each
    // union branch re-scan the fact for it
    val totals = graft.util.Checkpoints.track(
      li.agg(count(lit(1)).as("n_rows")).localCheckpoint())
    def audit(fk: String, dimKeys: DataFrame, name: String): DataFrame = {
      val orphans = li.select(col(fk)).join(broadcast(dimKeys), col(fk) === col("__k"), "left_anti")
      totals.crossJoin(
        orphans.agg(count(lit(1)).as("n_orphans")))
        .select(lit(name).as("fk_name"), col("n_rows"), col("n_orphans"),
          (col("n_orphans").cast("double") / col("n_rows")).as("orphan_rate"))
    }
    val parts = Tables.part(spark, dir).select(col("p_partkey").as("__k"))
    val supps = Tables.supplier(spark, dir).select(col("s_suppkey").as("__k"))
    val ords = Tables.orders(spark, dir).select(col("o_orderkey").as("__k"))
    audit("l_partkey", parts, "lineitem.l_partkey->part")
      .unionByName(audit("l_suppkey", supps, "lineitem.l_suppkey->supplier"))
      .unionByName(audit("l_orderkey", ords, "lineitem.l_orderkey->orders"))
      .orderBy(col("fk_name"))
  }

  val q109Sql: String =
    """SELECT 'lineitem.l_partkey->part' AS fk_name,
      |  (SELECT COUNT(*) FROM lineitem) AS n_rows,
      |  (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
      |     (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)) AS n_orphans,
      |  CAST((SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
      |     (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)) AS DOUBLE)
      |    / (SELECT COUNT(*) FROM lineitem) AS orphan_rate
      |UNION ALL
      |SELECT 'lineitem.l_suppkey->supplier',
      |  (SELECT COUNT(*) FROM lineitem),
      |  (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
      |     (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey)),
      |  CAST((SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
      |     (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey)) AS DOUBLE)
      |    / (SELECT COUNT(*) FROM lineitem)
      |UNION ALL
      |SELECT 'lineitem.l_orderkey->orders',
      |  (SELECT COUNT(*) FROM lineitem),
      |  (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
      |     (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)),
      |  CAST((SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
      |     (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS DOUBLE)
      |    / (SELECT COUNT(*) FROM lineitem)
      |ORDER BY fk_name""".stripMargin

  // ------------------------------------------------------------------
  // q112 — snapshot drift audit: split the event corpus at its date
  // midpoint and compare each event_type's volume and value
  // distribution across the halves — the monitor that catches silent
  // upstream shifts (a source going quiet, a metric changing units)
  // before they poison a training run. One conditional-aggregation pass
  // over the fact (map-side partial, no per-half scan); the pivot date
  // is computed from a scalar bounds row and broadcast. Sums go through
  // decimal(18,2) so both engines add exactly; the avgs and drift are
  // single double operations on those exact inputs (cross-engine safe
  // unrounded, same rule as q40's ratios).
  // ------------------------------------------------------------------
  def q112SnapshotDrift(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), to_date(col("ts")).as("d"),
        col("value").cast("decimal(18,2)").as("v"))
    val bounds = ev.agg(min(col("d")).as("lo"), max(col("d")).as("hi"))
      .select(expr("date_add(lo, CAST(floor(datediff(hi, lo) / 2) AS INT))").as("pivot_d"))
    val early = col("d") <= col("pivot_d")
    ev.crossJoin(broadcast(bounds))
      .groupBy(col("event_type"))
      .agg(
        sum(when(early, 1L).otherwise(0L)).as("n_early"),
        sum(when(!early, 1L).otherwise(0L)).as("n_late"),
        sum(when(early, col("v"))).as("sum_early_dec"),
        sum(when(!early, col("v"))).as("sum_late_dec"))
      .select(col("event_type"), col("n_early"), col("n_late"),
        // Spark (NULL) and DuckDB (IEEE inf) disagree on x/0: guard the
        // one division whose dividend is non-null at zero denominator,
        // so a type that only exists late reads as NULL in both engines
        when(col("n_early") > 0,
          col("n_late").cast("double") / col("n_early")).as("volume_ratio"),
        (col("sum_early_dec").cast("double") / col("n_early")).as("avg_early"),
        (col("sum_late_dec").cast("double") / col("n_late")).as("avg_late"),
        (col("sum_late_dec").cast("double") / col("n_late")
          - col("sum_early_dec").cast("double") / col("n_early")).as("avg_drift"))
      .orderBy(col("event_type"))
  }

  val q112Sql: String =
    """WITH e AS (
      |  SELECT event_type, CAST(ts AS DATE) AS d,
      |    CAST(value AS DECIMAL(18,2)) AS v
      |  FROM events),
      |b AS (
      |  SELECT MIN(d) + CAST(FLOOR(date_diff('day', MIN(d), MAX(d)) / 2) AS INTEGER) AS pivot_d
      |  FROM e)
      |SELECT event_type,
      |  CAST(SUM(CASE WHEN d <= pivot_d THEN 1 ELSE 0 END) AS BIGINT) AS n_early,
      |  CAST(SUM(CASE WHEN d > pivot_d THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
      |  CASE WHEN SUM(CASE WHEN d <= pivot_d THEN 1 ELSE 0 END) > 0
      |    THEN CAST(SUM(CASE WHEN d > pivot_d THEN 1 ELSE 0 END) AS DOUBLE)
      |      / SUM(CASE WHEN d <= pivot_d THEN 1 ELSE 0 END) END AS volume_ratio,
      |  CAST(SUM(CASE WHEN d <= pivot_d THEN v END) AS DOUBLE)
      |    / SUM(CASE WHEN d <= pivot_d THEN 1 ELSE 0 END) AS avg_early,
      |  CAST(SUM(CASE WHEN d > pivot_d THEN v END) AS DOUBLE)
      |    / SUM(CASE WHEN d > pivot_d THEN 1 ELSE 0 END) AS avg_late,
      |  CAST(SUM(CASE WHEN d > pivot_d THEN v END) AS DOUBLE)
      |    / SUM(CASE WHEN d > pivot_d THEN 1 ELSE 0 END)
      |  - CAST(SUM(CASE WHEN d <= pivot_d THEN v END) AS DOUBLE)
      |    / SUM(CASE WHEN d <= pivot_d THEN 1 ELSE 0 END) AS avg_drift
      |FROM e, b
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  // ------------------------------------------------------------------
  // q115 — point-in-time (temporal) dimension join: enrich each fact
  // with the SCD2 version that was current AT THE FACT'S TIMESTAMP —
  // the leak-free feature lookup every training pipeline needs against
  // a versioned dimension (the reference's registry history, stored as
  // q79 builds it). Semantics are as-of latest-prior, NOT a
  // BETWEEN-range predicate: the [valid_from, valid_to] form leaves a
  // 1-second boundary gap by construction, and Spark plans a non-equi
  // range join as BNLJ anyway. Composition: q79's dimension + the
  // generic single-shuffle AsofJoin (union trick — one shuffle on the
  // key, a carried struct per row, zero join explosion), then a
  // per-station rollup. The oracle states the same semantics as a
  // latest-prior QUALIFY.
  // ------------------------------------------------------------------
  def q115PointInTime(spark: SparkSession, dir: String): DataFrame = {
    val dim = q79Scd2Dimension(spark, dir)
      .select(col("station_id"), col("valid_from"), col("reading"))
    val facts = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .withColumn("station_id",
        concat(lit("S"), lpad((col("user_id") % 100).cast("string"), 3, "0")))
      // one fact per (station, event_id), deterministically (earliest ts):
      // a duplicate event_id would otherwise produce two as-of rows where
      // the oracle's QUALIFY keeps one — counts must agree on malformed
      // input too
      .groupBy(col("station_id"), col("event_id"))
      .agg(min(col("ts")).as("ts"))
    AsofJoin.nearestPrior(facts, dim, Seq("station_id"),
        leftTs = "ts", rightTs = "valid_from", payloadCols = Seq("reading"))
      .groupBy(col("station_id"))
      .agg(count(lit(1)).as("n_events"),
        count(col("asof_reading")).as("n_matched"),
        (sum(dec(col("asof_reading"))).cast("double") / count(col("asof_reading")))
          .as("avg_reading"))
      .orderBy(col("station_id"))
  }

  val q115Sql: String =
    """WITH upd AS (
      |  SELECT 'S' || lpad(CAST(user_id % 100 AS VARCHAR), 3, '0') AS station_id,
      |    date_trunc('day', CAST(ts AS TIMESTAMP)) AS valid_from,
      |    CAST(MAX(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS reading
      |  FROM events GROUP BY 1, 2),
      |f AS (
      |  SELECT 'S' || lpad(CAST(user_id % 100 AS VARCHAR), 3, '0') AS station_id,
      |    event_id, MIN(CAST(ts AS TIMESTAMP)) AS ts
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
      |pit AS (
      |  SELECT f.station_id, f.event_id, u.reading
      |  FROM f LEFT JOIN upd u
      |    ON f.station_id = u.station_id AND u.valid_from <= f.ts
      |  QUALIFY ROW_NUMBER() OVER (PARTITION BY f.station_id, f.event_id
      |    ORDER BY u.valid_from DESC NULLS LAST) = 1)
      |SELECT station_id, CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(COUNT(reading) AS BIGINT) AS n_matched,
      |  CAST(SUM(CAST(reading AS DECIMAL(18,2))) AS DOUBLE) / COUNT(reading) AS avg_reading
      |FROM pit GROUP BY station_id ORDER BY station_id""".stripMargin

  // ------------------------------------------------------------------
  // q116 — ordered funnel (view → click → purchase): for each user the
  // first view, the first click strictly AFTER that view, and the first
  // purchase strictly after that click — the product-analytics query
  // where order matters, not mere presence. Three chained conditional
  // mins as whole-partition window expressions sharing ONE exchange on
  // user_id (same partitioning → Spark reuses the shuffle; each step
  // references the previous step's column, which a single groupBy
  // cannot express). Counts + conversion rates in one final 1-row
  // aggregate. At 100 TB: one shuffle of the event log, state per user
  // is three timestamps.
  // ------------------------------------------------------------------
  def q116Funnel(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
    // NULL keys out up front: a funnel is per-user by definition, and the
    // engines disagree downstream (Spark windows group NULLs into one
    // partition; the oracle's equi-join drops them)
    val staged = Tables.events(spark, dir)
      .filter(col("user_id").isNotNull)
      .select(col("user_id"), col("event_type"), col("ts"))
      .withColumn("t1", min(when(col("event_type") === "view", col("ts"))).over(w))
      .withColumn("t2", min(when(col("event_type") === "click" &&
        col("ts") > col("t1"), col("ts"))).over(w))
      .withColumn("t3", min(when(col("event_type") === "purchase" &&
        col("ts") > col("t2"), col("ts"))).over(w))
    staged.groupBy(col("user_id"))
      .agg(max(col("t1")).as("t1"), max(col("t2")).as("t2"), max(col("t3")).as("t3"))
      .agg(count(col("user_id")).as("n_users"), // NULL key group excluded,
        // matching the oracle's COUNT(DISTINCT user_id)
        count(col("t1")).as("n_view"),
        count(col("t2")).as("n_view_click"),
        count(col("t3")).as("n_full_funnel"))
      .select(col("n_users"), col("n_view"), col("n_view_click"), col("n_full_funnel"),
        (col("n_view_click").cast("double") / col("n_view")).as("click_rate"),
        (col("n_full_funnel").cast("double") / col("n_view_click")).as("purchase_rate"))
  }

  val q116Sql: String =
    """WITH e AS (
      |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events
      |  WHERE user_id IS NOT NULL),
      |t1 AS (
      |  SELECT user_id, MIN(ts) AS t1 FROM e WHERE event_type = 'view' GROUP BY user_id),
      |t2 AS (
      |  SELECT e.user_id, MIN(e.ts) AS t2 FROM e JOIN t1 ON e.user_id = t1.user_id
      |  WHERE e.event_type = 'click' AND e.ts > t1.t1 GROUP BY e.user_id),
      |t3 AS (
      |  SELECT e.user_id, MIN(e.ts) AS t3 FROM e JOIN t2 ON e.user_id = t2.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts > t2.t2 GROUP BY e.user_id)
      |SELECT
      |  (SELECT COUNT(DISTINCT user_id) FROM e) AS n_users,
      |  (SELECT COUNT(*) FROM t1) AS n_view,
      |  (SELECT COUNT(*) FROM t2) AS n_view_click,
      |  (SELECT COUNT(*) FROM t3) AS n_full_funnel,
      |  CAST((SELECT COUNT(*) FROM t2) AS DOUBLE)
      |    / (SELECT COUNT(*) FROM t1) AS click_rate,
      |  CAST((SELECT COUNT(*) FROM t3) AS DOUBLE)
      |    / (SELECT COUNT(*) FROM t2) AS purchase_rate""".stripMargin

  // ------------------------------------------------------------------
  // q117 — cohort retention: users grouped by first-seen date, activity
  // counted by day offset from that date — the (cohort × offset)
  // retention triangle. Two shuffles total: user_id (first-seen
  // aggregate, then the fact re-keyed through it) and (cohort, offset);
  // cohort sizes ride a broadcast join of the tiny cohort table. All
  // counts exact; the rate is one double division.
  // ------------------------------------------------------------------
  def q117CohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("d"))
    val cohorts = ev.groupBy(col("user_id")).agg(min(col("d")).as("cohort"))
    val sizes = cohorts.groupBy(col("cohort")).agg(count(lit(1)).as("cohort_size"))
    ev.join(cohorts, "user_id")
      .groupBy(col("cohort"), datediff(col("d"), col("cohort")).as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_active"))
      .join(broadcast(sizes), "cohort")
      .select(col("cohort"), col("day_offset"), col("n_active"), col("cohort_size"),
        (col("n_active").cast("double") / col("cohort_size")).as("retention"))
      .orderBy(col("cohort"), col("day_offset"))
  }

  val q117Sql: String =
    """WITH e AS (
      |  SELECT user_id, CAST(ts AS DATE) AS d FROM events),
      |c AS (SELECT user_id, MIN(d) AS cohort FROM e GROUP BY user_id),
      |s AS (SELECT cohort, CAST(COUNT(*) AS BIGINT) AS cohort_size FROM c GROUP BY cohort),
      |a AS (
      |  SELECT c.cohort, date_diff('day', c.cohort, e.d) AS day_offset,
      |    COUNT(DISTINCT e.user_id) AS n_active
      |  FROM e JOIN c ON e.user_id = c.user_id
      |  GROUP BY 1, 2)
      |SELECT a.cohort, CAST(a.day_offset AS INTEGER) AS day_offset,
      |  CAST(a.n_active AS BIGINT) AS n_active, s.cohort_size,
      |  CAST(a.n_active AS DOUBLE) / s.cohort_size AS retention
      |FROM a JOIN s ON a.cohort = s.cohort
      |ORDER BY a.cohort, a.day_offset""".stripMargin

  // ------------------------------------------------------------------
  // q119 — batch sessionization: split each user's event stream into
  // sessions at >12 h inactivity gaps (the batch twin of q54/q87's
  // streaming session windows), then report the session-size histogram.
  // Classic gap-and-island: LAG marks session starts, a running SUM
  // numbers them. ONE exchange on user_id serves both window passes AND
  // the (user, session) aggregate (HashPartitioning(user) satisfies the
  // superset clustering), so at 100 TB this is a single shuffle of the
  // log with O(1) window state per row. All arithmetic integer (µs
  // epochs) until the two final divisions. Tied timestamps are safe:
  // LAG hands exactly one of the tied rows the prior ts regardless of
  // tie order, and the default RANGE cumulative frame gives every tied
  // row the same session id in both engines.
  // ------------------------------------------------------------------
  def q119Sessionization(spark: SparkSession, dir: String): DataFrame = {
    val GapUs = 12L * 3600 * 1000000
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
    val e = Tables.events(spark, dir)
      .filter(col("user_id").isNotNull)
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
    val sessions = e
      .withColumn("is_new",
        when(lag(col("us"), 1).over(w).isNull ||
          col("us") - lag(col("us"), 1).over(w) > GapUs, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("is_new")).over(
        Window.partitionBy(col("user_id")).orderBy(col("us"))
          .rangeBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        (max(col("us")) - min(col("us"))).as("dur_us"))
    sessions
      .groupBy(when(col("n_events") === 1, "1")
        .when(col("n_events") <= 3, "2-3")
        .when(col("n_events") <= 7, "4-7")
        .otherwise("8+").as("bucket"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("n_events")).as("n_events_total"),
        (sum(col("n_events")).cast("double") / count(lit(1))).as("avg_events"),
        ((sum(col("dur_us")).cast("double") / count(lit(1))) / lit(1000000.0))
          .as("avg_duration_sec"))
      .orderBy(col("bucket"))
  }

  val q119Sql: String =
    """WITH e AS (
      |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us
      |  FROM events WHERE user_id IS NOT NULL),
      |l AS (
      |  SELECT user_id, us,
      |    CASE WHEN lag(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
      |      OR us - lag(us) OVER (PARTITION BY user_id ORDER BY us) > 43200000000
      |      THEN 1 ELSE 0 END AS is_new
      |  FROM e),
      |s AS (
      |  SELECT user_id, us,
      |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY us) AS session_id
      |  FROM l),
      |g AS (
      |  SELECT user_id, session_id, COUNT(*) AS n_events,
      |    MAX(us) - MIN(us) AS dur_us
      |  FROM s GROUP BY 1, 2)
      |SELECT CASE WHEN n_events = 1 THEN '1' WHEN n_events <= 3 THEN '2-3'
      |            WHEN n_events <= 7 THEN '4-7' ELSE '8+' END AS bucket,
      |  CAST(COUNT(*) AS BIGINT) AS n_sessions,
      |  CAST(SUM(n_events) AS BIGINT) AS n_events_total,
      |  CAST(SUM(n_events) AS DOUBLE) / COUNT(*) AS avg_events,
      |  (CAST(SUM(dur_us) AS DOUBLE) / COUNT(*)) / 1000000.0 AS avg_duration_sec
      |FROM g GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------------------------
  // q121 — per-group z-score anomaly detection: flag events whose value
  // sits >3 standard deviations from their event_type's mean — the
  // data-quality monitor run before a metric feeds training. Sufficient
  // statistics (n, Σv, Σv²) in ONE map-side-combined pass over exact
  // decimals (source values have 2 decimals, so v² has exactly 4 — no
  // rounding anywhere in the sums), broadcast back to the fact for the
  // flagging pass. The anomaly predicate is squared — (v-μ)² > 9·σ² —
  // so it sits on +,-,* arithmetic only (IEEE-deterministic cross-
  // engine); sqrt appears only in the rounded report column. At 100 TB:
  // two fact scans, a 6-double broadcast, zero row explosion.
  // ------------------------------------------------------------------
  def q121AnomalyZscore(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .filter(col("value").isNotNull)
      .select(col("event_type"), dec(col("value")).as("v"))
    val mean = col("sv").cast("double") / col("n")
    val stats = e.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"),
        sum((col("v") * col("v")).cast("decimal(38,4)")).as("svv"))
      .select(col("event_type"), col("n"), mean.as("mean"),
        (col("svv").cast("double") / col("n") - mean * mean).as("vr"))
    val vd = col("v").cast("double")
    e.join(broadcast(stats), "event_type")
      .groupBy(col("event_type"), col("n"), col("mean"), col("vr"))
      .agg(sum(when((vd - col("mean")) * (vd - col("mean")) > lit(9.0) * col("vr"), 1L)
        .otherwise(0L)).as("n_anomalies"))
      .select(col("event_type"), col("n"),
        graft.weather.WeatherPipeline.roundSafe(col("mean"), 6).as("mean6"),
        graft.weather.WeatherPipeline.roundSafe(
          sqrt(greatest(col("vr"), lit(0.0))), 6).as("std6"),
        col("n_anomalies"),
        (col("n_anomalies").cast("double") / col("n")).as("anomaly_rate"))
      .orderBy(col("event_type"))
  }

  val q121Sql: String =
    """WITH e AS (
      |  SELECT event_type, CAST(value AS DECIMAL(18,2)) AS v
      |  FROM events WHERE value IS NOT NULL),
      |st AS (
      |  SELECT event_type, COUNT(*) AS n, SUM(v) AS sv,
      |    SUM(CAST(v * v AS DECIMAL(38,4))) AS svv
      |  FROM e GROUP BY 1),
      |m AS (
      |  SELECT event_type, n,
      |    CAST(sv AS DOUBLE) / n AS mean,
      |    CAST(svv AS DOUBLE) / n
      |      - (CAST(sv AS DOUBLE) / n) * (CAST(sv AS DOUBLE) / n) AS vr
      |  FROM st)
      |SELECT e.event_type, m.n AS n,
      |  round(round(m.mean * 1e8) / 100) / 1e6 + 0.0 AS mean6,
      |  round(round(sqrt(greatest(m.vr, 0.0)) * 1e8) / 100) / 1e6 + 0.0 AS std6,
      |  CAST(SUM(CASE WHEN (CAST(e.v AS DOUBLE) - m.mean) * (CAST(e.v AS DOUBLE) - m.mean)
      |    > 9.0 * m.vr THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies,
      |  CAST(SUM(CASE WHEN (CAST(e.v AS DOUBLE) - m.mean) * (CAST(e.v AS DOUBLE) - m.mean)
      |    > 9.0 * m.vr THEN 1 ELSE 0 END) AS DOUBLE) / m.n AS anomaly_rate
      |FROM e JOIN m USING (event_type)
      |GROUP BY e.event_type, m.n, m.mean, m.vr
      |ORDER BY e.event_type""".stripMargin

  // ------------------------------------------------------------------
  // q122 — rolling time-series features: per-user trailing-5-event
  // moving average and event-over-event delta — the feature-engineering
  // pass that turns a raw log into model inputs. Users are selected by
  // the same stable md5-prefix sampling as q70 (membership is a pure
  // function of user_id — features for a user never change as other
  // users arrive), then ONE exchange on user_id carries both window
  // passes. The ROWS frame needs a TOTAL order: (ts, event_id) — event
  // ids are the tie-break so duplicate timestamps can't make the frame
  // contents engine-dependent. Moving sums stay decimal (exact) until
  // the one division. At 100 TB: sampling prunes at the scan, then a
  // single shuffle of the sampled slice.
  // ------------------------------------------------------------------
  def q122RollingFeatures(spark: SparkSession, dir: String): DataFrame = {
    val ord = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val frame = ord.rowsBetween(-4, 0)
    Tables.events(spark, dir)
      .filter(col("user_id").isNotNull &&
        substring(md5(col("user_id").cast("string")), 1, 2) < "20")
      .select(col("user_id"), col("event_id"), col("ts"), dec(col("value")).as("v"))
      .withColumn("ma5",
        sum(col("v")).over(frame).cast("double") / count(lit(1)).over(frame))
      .withColumn("delta", (col("v") - lag(col("v"), 1).over(ord)).cast("double"))
      .select(col("user_id"), col("event_id"),
        date_trunc("second", col("ts")).as("t"),
        col("v").cast("double").as("value"), col("ma5"), col("delta"))
      .orderBy(col("user_id"), col("event_id"))
  }

  val q122Sql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
      |    CAST(value AS DECIMAL(18,2)) AS v
      |  FROM events
      |  WHERE user_id IS NOT NULL
      |    AND substring(md5(CAST(user_id AS VARCHAR)), 1, 2) < '20')
      |SELECT user_id, event_id, date_trunc('second', ts) AS t,
      |  CAST(v AS DOUBLE) AS value,
      |  CAST(SUM(v) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS DOUBLE)
      |    / COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS ma5,
      |  CAST(v - lag(v) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |    AS DOUBLE) AS delta
      |FROM e
      |ORDER BY user_id, event_id""".stripMargin

  // ------------------------------------------------------------------
  // q124 — EWMA features, integer-exact: a 4-tap exponentially-weighted
  // moving average (α = 1/2) per user, rolled up to the mean EWMA and
  // mean |value − EWMA| deviation per event_type — the smoothed-signal
  // features a forecasting pipeline derives from a raw log. The α = 1/2
  // choice is deliberate: weights 8/4/2/1 over cents-scaled values keep
  // EVERY intermediate — the weighted sum, the deviation, and their
  // group totals — in exact int64, so the cross-engine result is exact
  // with no float-summation order hazard at all; doubles appear only in
  // the two final divisions. Rows without 3 predecessors are excluded
  // (constant denominator 15). One user_id exchange serves all three
  // LAGs; the rollup is map-side combined. At 100 TB: one shuffle of
  // the log, O(1) state per row.
  // ------------------------------------------------------------------
  def q124EwmaFeatures(spark: SparkSession, dir: String): DataFrame = {
    val ord = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .filter(col("user_id").isNotNull && col("value").isNotNull)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"),
        (dec(col("value")) * 100).cast("long").as("vc"))
      .withColumn("l1", lag(col("vc"), 1).over(ord))
      .withColumn("l2", lag(col("vc"), 2).over(ord))
      .withColumn("l3", lag(col("vc"), 3).over(ord))
      .filter(col("l3").isNotNull)
      .withColumn("ewma15",
        col("vc") * 8 + col("l1") * 4 + col("l2") * 2 + col("l3"))
      .withColumn("dev15", abs(col("vc") * 15 - col("ewma15")))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("ewma15")).as("s_ewma15"), sum(col("dev15")).as("s_dev15"))
      .select(col("event_type"), col("n"),
        (col("s_ewma15").cast("double") / (col("n") * 1500)).as("avg_ewma"),
        (col("s_dev15").cast("double") / (col("n") * 1500)).as("avg_abs_dev"))
      .orderBy(col("event_type"))
  }

  val q124Sql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc
      |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL),
      |l AS (
      |  SELECT event_type, vc,
      |    lag(vc, 1) OVER w AS l1, lag(vc, 2) OVER w AS l2, lag(vc, 3) OVER w AS l3
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |f AS (
      |  SELECT event_type, vc * 8 + l1 * 4 + l2 * 2 + l3 AS ewma15,
      |    abs(vc * 15 - (vc * 8 + l1 * 4 + l2 * 2 + l3)) AS dev15
      |  FROM l WHERE l3 IS NOT NULL)
      |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(ewma15) AS DOUBLE) / (COUNT(*) * 1500) AS avg_ewma,
      |  CAST(SUM(dev15) AS DOUBLE) / (COUNT(*) * 1500) AS avg_abs_dev
      |FROM f GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------------------------
  /** Undirected part co-occurrence graph (parts sharing an order):
    * distinct edges (u < v) plus per-node degrees. The edge list is
    * localCheckpoint'ed because every consumer — q125's orientation +
    * three join sides, q130's adjacency + iterations — would otherwise
    * re-run the distinct self-join per reference. Since optimization
    * r17 the checkpoint is a CROSS-QUERY memo per (session, corpus)
    * rather than a per-query transient (VERDICT r16 next-round #6):
    * q125 and q130 — and each one's second bench rep — share ONE build
    * of the same deterministic edge set (~1.5 s each at sf0.1). The
    * build cost stays driver-visible as the bench's own
    * `prewarm_part_graph` key (the standing priced-prewarm
    * convention); [[clearGraph]] releases the pinned blocks at harness
    * teardown, mirroring [[graft.weather.WeatherQueries.clear]]. */
  private val partGraphMemo = scala.collection.mutable.Map
    .empty[(SparkSession, String), (DataFrame, DataFrame)]

  /** Spec observable: graph builds actually RUN (vs memo hits). */
  private[graft] val graphBuilds = new java.util.concurrent.atomic.AtomicLong

  private def partGraph(spark: SparkSession, dir: String): (DataFrame, DataFrame) =
    partGraphMemo.synchronized {
      partGraphMemo.getOrElseUpdate((spark, dir), {
        graphBuilds.incrementAndGet()
        val li = Tables.lineitem(spark, dir)
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("s"))
        // pair generation is GROUPED, not self-joined (optimization r17,
        // guide §2.4): one exchange on ok + a map-side array expansion
        // (sorted distinct parts per order, pairs via x > u filter)
        // replaces the equi-self-join's two exchanges and per-row hash
        // probes — identical pair set (u < v over each order's distinct
        // parts), and the per-order fan-out is bounded by order size
        // exactly as the a.s < b.s join was
        // slice-by-position, not filter(x -> x > u): the sorted array
        // makes "greater elements" a positional suffix, and slice stays
        // whole-stage-codegen where the lambda HOF would run interpreted
        val e0 = li.groupBy(col("ok"))
          .agg(sort_array(collect_set(col("s"))).as("ss"))
          .select(posexplode(col("ss")).as(Seq("i", "u")), col("ss"))
          .select(col("u"),
            explode(expr("slice(ss, i + 2, size(ss))")).as("v"))
          .distinct()
          .localCheckpoint(true)
        // degrees ride their own checkpoint: three consumers (q125's
        // orientation joins + triad count, q130's adjacency + degc)
        // re-ran the |2E|-row union-aggregate per reference otherwise
        val deg = e0.select(col("u").as("x"))
          .unionAll(e0.select(col("v").as("x")))
          .groupBy(col("x")).agg(count(lit(1)).as("d"))
          .localCheckpoint(true)
        (e0, deg)
      })
    }

  /** Bench prewarm face for the shared graph build (priced key);
    * returns the memoized (edges, degrees) pair for spec observability. */
  def prewarmPartGraph(spark: SparkSession, dir: String): (DataFrame, DataFrame) =
    partGraph(spark, dir)

  /** Release + drop the memoized graph checkpoints (harness teardown —
    * see [[graft.util.Checkpoints.release]]). */
  def clearGraph(): Unit = partGraphMemo.synchronized {
    partGraphMemo.values.foreach { case (e0, deg) =>
      graft.util.Checkpoints.release(e0)
      graft.util.Checkpoints.release(deg)
    }
    partGraphMemo.clear()
  }

  // ------------------------------------------------------------------
  // q125 — triangle counting on the part co-occurrence graph (parts
  // sharing an order are connected — the "bought together" graph;
  // suppliers would form a degenerate complete graph at every SF, parts
  // stay sparse with SF-invariant degree ≈ 115): nodes, edges, triangles
  // and the global clustering coefficient — the graph-statistics pass
  // behind community/fraud analysis, and the second graph operator next
  // to q77's connected components. Edges are DEGREE-ORIENTED (from the
  // (deg, id)-smaller endpoint to the larger) before the path join, the
  // standard trick that counts each triangle exactly once AND bounds
  // the wedge fan-out by graph arboricity instead of max-degree — the
  // difference between a hub node exploding the join at 100 TB and the
  // load spreading evenly. All counts exact integers; the coefficient
  // is one final division.
  // ------------------------------------------------------------------
  def q125Triangles(spark: SparkSession, dir: String): DataFrame = {
    val (e0, deg) = partGraph(spark, dir)
    val ed = e0
      .join(deg.select(col("x").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("x").as("v"), col("d").as("dv")), "v")
    val uFirst = col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v"))
    // the oriented edge list feeds three join sides — checkpoint it once
    // (harness-swept) instead of rebuilding the orientation joins 3×.
    // REGIME PICK on the materialized |E| (a free count off the
    // checkpoint, same pattern as the LSH B(N) rule): a catalog-sized
    // edge list rides a BROADCAST on both probe sides so the
    // O(Σ outdeg²) wedge stream is generated AND closed map-side, never
    // shuffled (34.8 s → 12.5 s at sf0.1, |E| = 1.2M); past ~20M edges
    // (~0.5 GB hashed) the broadcast build itself is the bottleneck/OOM,
    // so the wedges close through a shuffle join — sf10's |E| = 120M
    // takes this branch. (Threshold conf-overridable so the spec can
    // force the shuffle branch at gate scale and pin branch equality.)
    // session parallelism — the FLOOR for the shuffle branch's
    // |E|-derived closing-join partitioning below (an explicit
    // repartition of `o` itself was tried and REVERTED: the intersect
    // shape at AQE's natural partitioning measured 5.6 s vs 10.4 s at
    // a forced 32 — the per-edge work is bandwidth-bound, and more
    // concurrent tasks just thrash the LLC)
    val np = spark.conf.get("spark.sql.shuffle.partitions").toIntOption
      .getOrElse(spark.sparkContext.defaultParallelism)
    val o = graft.util.Checkpoints.track(
      ed.select(when(uFirst, col("u")).otherwise(col("v")).as("a"),
        when(uFirst, col("v")).otherwise(col("u")).as("b"))
        .localCheckpoint(true))
    val maxBcast = spark.conf.getOption("spark.graft.triangles.broadcastMaxEdges")
      .flatMap(_.toLongOption).getOrElse(20000000L)
    val nEdges = o.count()
    val tri = if (nEdges <= maxBcast) {
      // ADJACENCY-INTERSECT shape (optimization r16, guide §4): the
      // previous wedge-stream shape materialized ~74M wedge ROWS at
      // sf0.1 through two broadcast hash joins and went memory-bound
      // (163 core-s / 5.3 s wall on 32 cores — row headers + hash
      // probes, not arithmetic). With degree orientation, triangle
      // {a,b,c} (edges a→b, a→c, b→c) is found EXACTLY once as
      // c ∈ out(a) ∩ out(b) at edge (a,b) — so each edge row
      // intersects two out-neighbor arrays instead of emitting a
      // wedge per pair: no wedge row exists, the per-edge work is a
      // contiguous array intersect, and the broadcast is the |V|-row
      // adjacency (Σ outdeg elements), smaller than the hashed edge
      // list it replaces. Inner joins are exact: an endpoint missing
      // from adj has no out-neighbors and would contribute 0.
      // (Wedge count n_triads still comes from deg below, unchanged.)
      val adj = o.groupBy(col("a"))
        .agg(collect_list(col("b")).as("nbrs"))
      o.join(broadcast(adj.select(col("a"), col("nbrs").as("na"))), "a")
        .join(broadcast(
          adj.select(col("a").as("b"), col("nbrs").as("nb"))), "b")
        .select(size(array_intersect(col("na"), col("nb"))).as("t"))
        .agg(coalesce(sum(col("t")), lit(0L)).cast("long")
          .as("n_triangles"))
    } else {
      // Shuffle regime, bloom-pruned (VERDICT-r7 #1). The naive shape —
      // materialize all Σ outdeg² wedges through a sort-merge join —
      // measured DNF at sf10 on one box (6.8B wedges exhaust 78 GB of
      // spill disk mid-sort). The orientation already bounds per-key
      // fan by arboricity (no degree skew to split); the killer is
      // total wedge VOLUME hitting the exchange. So the closing join
      // gets a hand-placed runtime filter: an exact-membership Bloom
      // sketch of the oriented edge set (fpp 1%, ~1.2 GB bits at 1B
      // edges — broadcastable at any realistic |E|) probes each wedge
      // AS IT IS GENERATED, map-side, pipelined inside the generation
      // join's output stage — wedges that close nowhere (the vast
      // majority) die before ever being shuffled, sorted, or spilled.
      // Survivors = triangles + fpp·wedges, re-verified by the exact
      // join, so the count is exact — false positives are filtered,
      // false negatives are impossible. The closing join is hinted
      // shuffle_hash: the survivor stream stays unsorted (hash probe
      // against the |E|/partitions build side) instead of paying a
      // billion-row sort. Catalyst's own InjectRuntimeFilter cannot
      // place this filter (it requires a selective scan-side creation
      // plan, not a self-join product) — same primitive, hand-placed.
      val bf = o.select(xxhash64(col("a"), col("b")).as("h"))
        .stat.bloomFilter("h", nEdges, 0.01)
      val probe = graft.functions.BloomExpressions.broadcastProbe(spark, bf)
      // the closing join's parallelism derives from |E|, not the core
      // count (optimization r16, guide §2.4): each SHJ task builds a
      // hash map of |E|/partitions edges, so the session constant puts
      // a ~4M-row (hundreds of MB) map in EVERY task at sf10's 120M
      // edges — measured SparkOutOfMemoryError on an 8 g heap where
      // the r7 environment had spilled through. ~500k build rows per
      // partition keeps each map tens of MB at any |E|; both sides
      // repartition by the join keys so the SHJ reads co-partitioned.
      val npClose = math.max(np, (nEdges / 500000L).toInt + 1)
      o.alias("e1").join(o.alias("e2"), col("e1.b") === col("e2.a"))
        .select(col("e1.a").as("wa"), col("e2.b").as("wc"))
        .filter(probe(xxhash64(col("wa"), col("wc"))))
        .repartition(npClose, col("wa"), col("wc"))
        .join(o.repartition(npClose, col("a"), col("b")).alias("e3")
          .hint("shuffle_hash"),
          col("wa") === col("e3.a") && col("wc") === col("e3.b"))
        .agg(count(lit(1)).as("n_triangles"))
    }
    val edges = e0.agg(count(lit(1)).as("n_edges"))
    val nodes = deg.agg(count(lit(1)).as("n_nodes"),
      expr("sum(d * (d - 1)) div 2").as("n_triads"))
    tri.crossJoin(edges).crossJoin(nodes)
      .select(col("n_nodes"), col("n_edges"), col("n_triangles"), col("n_triads"),
        when(col("n_triads") > 0,
          (col("n_triangles") * 3).cast("double") / col("n_triads")).as("clustering"))
  }

  val q125Sql: String =
    """WITH li AS (SELECT l_orderkey AS ok, l_partkey AS s FROM lineitem),
      |e0 AS (
      |  SELECT DISTINCT a.s AS u, b.s AS v
      |  FROM li a JOIN li b ON a.ok = b.ok AND a.s < b.s),
      |deg AS (
      |  SELECT x, COUNT(*) AS d FROM (
      |    SELECT u AS x FROM e0 UNION ALL SELECT v AS x FROM e0)
      |  GROUP BY 1),
      |o AS (
      |  SELECT CASE WHEN d1.d < d2.d OR (d1.d = d2.d AND e0.u < e0.v)
      |           THEN e0.u ELSE e0.v END AS a,
      |         CASE WHEN d1.d < d2.d OR (d1.d = d2.d AND e0.u < e0.v)
      |           THEN e0.v ELSE e0.u END AS b
      |  FROM e0 JOIN deg d1 ON d1.x = e0.u JOIN deg d2 ON d2.x = e0.v),
      |tri AS (
      |  SELECT COUNT(*) AS c FROM o e1
      |  JOIN o e2 ON e1.b = e2.a
      |  JOIN o e3 ON e3.a = e1.a AND e3.b = e2.b)
      |SELECT
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n_nodes,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM e0) AS n_edges,
      |  (SELECT CAST(c AS BIGINT) FROM tri) AS n_triangles,
      |  (SELECT CAST(SUM(d * (d - 1)) // 2 AS BIGINT) FROM deg) AS n_triads,
      |  CASE WHEN (SELECT SUM(d * (d - 1)) // 2 FROM deg) > 0
      |    THEN CAST((SELECT c FROM tri) * 3 AS DOUBLE)
      |      / (SELECT SUM(d * (d - 1)) // 2 FROM deg) END AS clustering""".stripMargin

  // ------------------------------------------------------------------
  // q127 — rolling 7-day KPIs via a RANGE frame: daily volume and
  // revenue per event_type plus trailing-7-CALENDAR-day windows — the
  // dashboard aggregate every analytics stack recomputes nightly. The
  // frame is RANGE over an integer day index, not ROWS: days with no
  // traffic must still age out of the window (a ROWS frame would
  // silently stretch across gaps). Revenue stays decimal through the
  // frame sum (exact), doubled only at the edge. The fact shuffles ONCE
  // to (type, day) partials — map-side combined — and the window runs
  // over the tiny daily table partitioned by type.
  // ------------------------------------------------------------------
  def q127Rolling7d(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("n"), sum(dec(col("value"))).as("rev_dec"))
      .withColumn("didx", datediff(col("d"), lit("2024-01-01").cast("date")))
    val w = Window.partitionBy(col("event_type")).orderBy(col("didx"))
      .rangeBetween(-6, 0)
    daily.select(col("event_type"), col("d"), col("n"),
        col("rev_dec").cast("double").as("revenue"),
        sum(col("n")).over(w).as("n_7d"),
        sum(col("rev_dec")).over(w).cast("double").as("revenue_7d"))
      .orderBy(col("event_type"), col("d"))
  }

  val q127Sql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS n,
      |    SUM(CAST(value AS DECIMAL(18,2))) AS rev_dec
      |  FROM events GROUP BY 1, 2),
      |x AS (
      |  SELECT *, date_diff('day', DATE '2024-01-01', d) AS didx FROM daily)
      |SELECT event_type, d, CAST(n AS BIGINT) AS n,
      |  CAST(rev_dec AS DOUBLE) AS revenue,
      |  CAST(SUM(n) OVER w AS BIGINT) AS n_7d,
      |  CAST(SUM(rev_dec) OVER w AS DOUBLE) AS revenue_7d
      |FROM x
      |WINDOW w AS (PARTITION BY event_type ORDER BY didx
      |  RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
      |ORDER BY event_type, d""".stripMargin

  // ------------------------------------------------------------------
  // q128 — Markov transition matrix over event sequences: P(next event
  // type | current) from per-user ordered bigrams — the sequence model
  // behind next-action prediction and bot detection. One exchange on
  // user_id for the LAG (total order (ts, event_id), so duplicate
  // timestamps can't flip a transition), then a tiny (from, to) count
  // matrix; row totals ride a broadcast. Counts exact; each probability
  // is one division.
  // ------------------------------------------------------------------
  def q128MarkovTransitions(spark: SparkSession, dir: String): DataFrame = {
    val ord = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val bi = Tables.events(spark, dir)
      .filter(col("user_id").isNotNull)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("from_type", lag(col("event_type"), 1).over(ord))
      .filter(col("from_type").isNotNull)
      .groupBy(col("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val tot = bi.groupBy(col("from_type")).agg(sum(col("n")).as("tot"))
    bi.join(broadcast(tot), "from_type")
      .select(col("from_type"), col("to_type"), col("n"),
        (col("n").cast("double") / col("tot")).as("p"))
      .orderBy(col("from_type"), col("to_type"))
  }

  val q128Sql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type
      |  FROM events WHERE user_id IS NOT NULL),
      |b AS (
      |  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |    AS from_type, event_type AS to_type
      |  FROM e),
      |c AS (
      |  SELECT from_type, to_type, COUNT(*) AS n FROM b
      |  WHERE from_type IS NOT NULL GROUP BY 1, 2),
      |t AS (SELECT from_type, SUM(n) AS tot FROM c GROUP BY 1)
      |SELECT c.from_type, c.to_type, CAST(c.n AS BIGINT) AS n,
      |  CAST(c.n AS DOUBLE) / t.tot AS p
      |FROM c JOIN t USING (from_type)
      |ORDER BY c.from_type, c.to_type""".stripMargin

  // ------------------------------------------------------------------
  // q129 — exact decile binning WITHOUT a global sort: assign every
  // purchase to its value decile and report per-bin stats — the feature
  // binning / price-tier segmentation pass. The global rank comes from
  // the same two-level machinery as q113's dense ids, keyed by VALUE
  // RANGE instead of id range: cents-bucket counts → broadcast
  // cumulative offsets → per-bucket row_number over (vc, event_id) (a
  // total order — ties can't migrate across engines). decile =
  // (rank·10) div n, all integer. The only single-partition stage is
  // the ~100-row bucket cumsum; the fact never funnels through one
  // task — the answer to "NTILE needs an unpartitioned window" at
  // 100 TB.
  // ------------------------------------------------------------------
  def q129DecileBinning(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase" && col("value").isNotNull)
      .select(col("event_id"), (dec(col("value")) * 100).cast("long").as("vc"))
    val b = e.withColumn("__b", expr("vc div 100"))
    val offsets = b.groupBy(col("__b")).agg(count(lit(1)).as("__cnt"))
      .withColumn("__off",
        coalesce(sum(col("__cnt")).over(
          Window.orderBy(col("__b"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__b"), col("__off"))
    val nn = e.agg(count(lit(1)).as("nn"))
    b.withColumn("__rn", row_number().over(
        Window.partitionBy(col("__b")).orderBy(col("vc"), col("event_id"))))
      .join(broadcast(offsets), "__b")
      .crossJoin(broadcast(nn))
      .select(col("vc"), (col("__rn") - 1 + col("__off")).as("rk"), col("nn"))
      .groupBy(expr("(rk * 10) div nn").as("decile"))
      .agg(count(lit(1)).as("n"),
        (min(col("vc")).cast("double") / 100).as("min_value"),
        (max(col("vc")).cast("double") / 100).as("max_value"),
        (sum(col("vc")).cast("double") / 100).as("sum_value"))
      .orderBy(col("decile"))
  }

  val q129Sql: String =
    """WITH e AS (
      |  SELECT event_id, CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc
      |  FROM events WHERE event_type = 'purchase' AND value IS NOT NULL),
      |r AS (
      |  SELECT vc, ROW_NUMBER() OVER (ORDER BY vc, event_id) - 1 AS rk,
      |    COUNT(*) OVER () AS nn
      |  FROM e)
      |SELECT CAST((rk * 10) // nn AS BIGINT) AS decile,
      |  CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(MIN(vc) AS DOUBLE) / 100 AS min_value,
      |  CAST(MAX(vc) AS DOUBLE) / 100 AS max_value,
      |  CAST(SUM(vc) AS DOUBLE) / 100 AS sum_value
      |FROM r GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------------------------
  // q130 — PageRank in integer fixed-point (d = 0.85, 5 iterations) on
  // the part co-occurrence graph: the canonical iterative-graph
  // workload, made bit-exact across engines by keeping ranks as
  // SCALE=1e12-scaled int64 with floor division everywhere — float
  // PageRank would accumulate contributions in engine-chosen order.
  // Structure is GraphX-style: a degree-annotated adjacency list
  // (checkpointed once), then per iteration one shuffle (contributions
  // grouped by destination) and a broadcast-back of the node table;
  // each iteration's rank frame is checkpointed so plans stay flat
  // instead of nesting 5 joins deep. No dangling-node term: every node
  // has degree ≥ 1 by construction (nodes exist only via edges).
  // ------------------------------------------------------------------
  def q130Pagerank(spark: SparkSession, dir: String): DataFrame = {
    // Iteration shape, MEASURED at sf0.1 (1.2M edges), keep-the-winner:
    //   (a) per-iteration rank checkpoint + shuffle joins  → 12.5 s  ✓
    //   (b) same but broadcasting the |V| rank table/iter  → 15.0 s
    //       (each broadcast materializes the previous iteration first —
    //        the job serializes into barrier waves)
    //   (c) no checkpoints, one 5-deep nested DAG          → 29.8 s
    //       (deg/nn recomputed inside every iteration; optimizer cost
    //        grows with plan depth — the classic iterative-algorithm trap)
    // The per-iteration checkpoint is what GraphX's Pregel does for the
    // same reason. On top of (a), the iteration join is CO-LOCATED: the
    // adjacency and every rank frame are hash-partitioned on the join
    // key before their (local)checkpoint — the captured LogicalRDD
    // carries that outputPartitioning, so iterations 1..5 plan NO
    // exchange on the |E|-row adjacency side; the only per-iteration
    // shuffle is the |V|-sized contribution reduce. That is the
    // cluster-scale term: the adjacency crosses the network once at
    // build, never per iteration. PlanShapeSpec pins the property.
    val (adjd, degc, nn) = pagerankFrames(spark, dir)
    var r = pagerankInit(degc, nn)
    for (_ <- 1 to 5)
      r = pagerankStep(degc, nn, pagerankContribs(adjd, r))
    r.orderBy(col("r").desc, col("x")).limit(20)
      .select(col("x").as("part_id"), col("r").as("rank_scaled"))
  }

  private val PrScale = 1000000000000L

  /** Adjacency (degree-annotated, hash-partitioned on src) + degrees
    * (hash-partitioned on x) + node count, each checkpointed so the
    * captured partitioning survives into every iteration's plan. */
  private[graft] def pagerankFrames(
      spark: SparkSession, dir: String): (DataFrame, DataFrame, DataFrame) = {
    val (e0, deg) = partGraph(spark, dir)
    // The iteration frames' partition count derives from the GRAPH, not
    // the session/core constant (optimization r17, guide §2.4 — the
    // StreamTune rule, batch edition): the explicit repartition below
    // pins the co-partitioning contract for all five iterations, so AQE
    // never gets to coalesce it, and the core-count default (32 local)
    // over-partitioned the KB-scale rank frames — 11 iteration stages
    // of 32 tasks each were pure scheduling at sf0.1 (measured 4.1-4.7 s
    // at 32 vs 2.9-3.2 s at 8-16 partitions, memo held constant). The
    // adjacency row count (2|E|, a free count off the checkpoint) sizes
    // it: ~250k rows (~7 MB) per task, floor 4, cap 4096 — sf0.1's
    // 2.4M adjacency rows derive 10, sf10's 240M derive 960, and a
    // cluster-scale graph keeps scaling where the constant would not.
    val perPart = spark.conf
      .getOption("spark.graft.pagerank.rowsPerPartition")
      .flatMap(_.toLongOption).getOrElse(250000L)
    val adjRows = 2L * e0.count()
    val np = math.max(4L, math.min(4096L, adjRows / perPart + 1)).toInt
    val adj = e0.select(col("u").as("src"), col("v").as("dst"))
      .unionAll(e0.select(col("v").as("src"), col("u").as("dst")))
    val adjd = graft.util.Checkpoints.track(
      adj.join(deg.select(col("x").as("src"), col("d").as("dsrc")), "src")
        .repartition(np, col("src")) // explicit np: AQE must not coalesce
        .localCheckpoint(true))      // away the co-partitioning contract
    val degc = graft.util.Checkpoints.track(
      deg.repartition(np, col("x")).localCheckpoint(true))
    (adjd, degc, degc.agg(count(lit(1)).as("nn")))
  }

  /** r₀ = 1/N; partitioning flows from degc through the broadcast cross
    * join and the checkpoint captures it — hash(x, np), no re-shuffle. */
  private[graft] def pagerankInit(degc: DataFrame, nn: DataFrame): DataFrame =
    graft.util.Checkpoints.track(
      degc.crossJoin(broadcast(nn))
        .select(col("x"), expr(s"$PrScale div nn").as("r"))
        .localCheckpoint(true))

  /** One contribution pass: adjd hash(src) ⋈ r hash(x→src) — alias-aware
    * partitioning propagation makes both sides co-partitioned, so the
    * ONLY exchange here is the hashpartitioning(dst) reduce. The rank
    * side carries a SHUFFLE_HASH hint (optimization r17): the memoized
    * degree checkpoint gave the planner a real (small) size estimate and
    * it started BROADCASTING the rank table each iteration — which
    * serializes the loop into per-iteration broadcast barriers (measured
    * 4.2-4.6 s vs 3.1-3.7 s at sf0.1, 3 reps each). The hint keeps the
    * zero-exchange co-partitioned hash join at EVERY size: both sides
    * are already hash(src, np), so the "shuffle" hash join plans with no
    * exchange and no per-iteration sort, and the |V|-row build side per
    * partition is exactly the state the broadcast would have shipped
    * whole. */
  private[graft] def pagerankContribs(adjd: DataFrame, r: DataFrame): DataFrame =
    adjd.join(
        r.select(col("x").as("src"), col("r").as("rsrc")).hint("shuffle_hash"),
        "src")
      .select(col("dst"), expr("(85 * rsrc) div (100 * dsrc)").as("c"))
      .groupBy(col("dst")).agg(sum(col("c")).as("sc"))

  /** Rank update; left side degc keeps hash(x), which the left-outer
    * join preserves and the checkpoint re-captures for next iteration. */
  private[graft] def pagerankStep(
      degc: DataFrame, nn: DataFrame, contribs: DataFrame): DataFrame =
    graft.util.Checkpoints.track(
      degc.crossJoin(broadcast(nn))
        // same SHUFFLE_HASH discipline as pagerankContribs: the reduce
        // output is already hash(dst, np) — co-partitioned with degc's
        // hash(x, np) — so the hint keeps the rank update exchange-free
        // instead of letting a small-size estimate re-broadcast it
        .join(contribs.hint("shuffle_hash"), col("x") === col("dst"), "left")
        .select(col("x"),
          (expr(s"(15 * $PrScale) div (100 * nn)")
            + coalesce(col("sc"), lit(0L))).as("r"))
        .localCheckpoint(true))

  val q130Sql: String = {
    val base =
      """WITH li AS (SELECT l_orderkey AS ok, l_partkey AS s FROM lineitem),
        |e0 AS (
        |  SELECT DISTINCT a.s AS u, b.s AS v
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.s < b.s),
        |deg AS (
        |  SELECT x, COUNT(*) AS d FROM (
        |    SELECT u AS x FROM e0 UNION ALL SELECT v AS x FROM e0)
        |  GROUP BY 1),
        |adj AS (SELECT u AS src, v AS dst FROM e0
        |        UNION ALL SELECT v AS src, u AS dst FROM e0),
        |nn AS (SELECT COUNT(*) AS nn FROM deg),
        |r0 AS (SELECT x, 1000000000000 // nn AS r FROM deg, nn)""".stripMargin
    val iters = (1 to 5).map { k =>
      s"""c$k AS (
         |  SELECT a.dst AS x, SUM((85 * p.r) // (100 * dg.d)) AS sc
         |  FROM adj a JOIN r${k - 1} p ON p.x = a.src JOIN deg dg ON dg.x = a.src
         |  GROUP BY 1),
         |r$k AS (
         |  SELECT d.x, CAST((SELECT (15 * 1000000000000) // (100 * nn) FROM nn)
         |    + COALESCE(c.sc, 0) AS BIGINT) AS r
         |  FROM deg d LEFT JOIN c$k c ON c.x = d.x)""".stripMargin
    }.mkString(",\n")
    s"""$base,
       |$iters
       |SELECT x AS part_id, CAST(r AS BIGINT) AS rank_scaled
       |FROM r5 ORDER BY r DESC, x LIMIT 20""".stripMargin
  }

  // ------------------------------------------------------------------
  // q131 — opt-out purge audit: the report a right-to-be-forgotten run
  // produces — per event_type, rows before / removed / after plus an
  // exact retained-id checksum that downstream consumers can re-verify
  // without trusting the purge job. Opt-out membership is the stable
  // md5-prefix function (≈3% of users), so the audit is a pure function
  // of the data. ONE conditional-aggregation pass over the fact
  // (map-side partials, no per-cohort scan); NULL user_id rows are not
  // deletable and count as retained. The physical deletion itself is
  // Bronze.redactUsers (partition-surgical, RedactionSpec); this query
  // is its verification artifact.
  // ------------------------------------------------------------------
  def q131OptoutPurge(spark: SparkSession, dir: String): DataFrame = {
    val opted = col("user_id").isNotNull &&
      substring(md5(col("user_id").cast("string")), 1, 2) >= "f8"
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_before"),
        sum(when(opted, 1L).otherwise(0L)).as("n_removed"),
        sum(when(!opted, 1L).otherwise(0L)).as("n_after"),
        sum(when(!opted, col("event_id"))).as("retained_id_sum"))
      .orderBy(col("event_type"))
  }

  val q131Sql: String =
    """WITH e AS (
      |  SELECT event_type, event_id,
      |    user_id IS NOT NULL
      |      AND substring(md5(CAST(user_id AS VARCHAR)), 1, 2) >= 'f8' AS opted
      |  FROM events)
      |SELECT event_type,
      |  CAST(COUNT(*) AS BIGINT) AS n_before,
      |  CAST(SUM(CASE WHEN opted THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
      |  CAST(SUM(CASE WHEN NOT opted THEN 1 ELSE 0 END) AS BIGINT) AS n_after,
      |  CAST(SUM(CASE WHEN NOT opted THEN event_id END) AS BIGINT) AS retained_id_sum
      |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin

  // ------------------------------------------------------------------
  // q132 — k-anonymity audit: the privacy gate a release manager runs
  // before publishing an event extract. Quasi-identifier = (event_type,
  // day, $10 value band); a row is re-identifiable when its QI class
  // holds fewer than k=5 rows. Two map-side-combinable aggregations —
  // fact → QI classes → per-type summary — report the k-anonymity level
  // (min class size), the small-class count, and the rows a k=5
  // suppression pass would redact. All-integer until the one risk-rate
  // division. At 100 TB both aggs partial-combine; the QI-class
  // cardinality (types × days × bands) is bounded and tiny relative to
  // the fact, so the second agg is effectively free.
  // ------------------------------------------------------------------
  def q132Kanonymity(spark: SparkSession, dir: String): DataFrame = {
    val classes = Tables.events(spark, dir)
      .select(col("event_type"), to_date(col("ts")).as("d"),
        ((dec(col("value")) * 100).cast("long")).as("vc"))
      .withColumn("band", expr("vc div 1000"))
      .groupBy(col("event_type"), col("d"), col("band"))
      .agg(count(lit(1)).as("cnt"))
    classes.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_classes"),
        min(col("cnt")).as("k_anonymity"),
        sum(when(col("cnt") < 5, 1L).otherwise(0L)).as("n_small_classes"),
        sum(when(col("cnt") < 5, col("cnt")).otherwise(0L)).as("rows_at_risk"),
        sum(col("cnt")).as("n_rows"))
      .select(col("event_type"), col("n_classes"), col("k_anonymity"),
        col("n_small_classes"), col("rows_at_risk"), col("n_rows"),
        graft.weather.WeatherPipeline.roundSafe(
          col("rows_at_risk").cast("double") / col("n_rows"), 6).as("risk_rate6"))
      .orderBy(col("event_type"))
  }

  val q132Sql: String =
    """WITH classes AS (
      |  SELECT event_type, CAST(ts AS DATE) AS d,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) // 1000 AS band,
      |    COUNT(*) AS cnt
      |  FROM events GROUP BY 1, 2, 3)
      |SELECT event_type,
      |  CAST(COUNT(*) AS BIGINT) AS n_classes,
      |  CAST(MIN(cnt) AS BIGINT) AS k_anonymity,
      |  CAST(SUM(CASE WHEN cnt < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_small_classes,
      |  CAST(SUM(CASE WHEN cnt < 5 THEN cnt ELSE 0 END) AS BIGINT) AS rows_at_risk,
      |  CAST(SUM(cnt) AS BIGINT) AS n_rows,
      |  round(round((CAST(SUM(CASE WHEN cnt < 5 THEN cnt ELSE 0 END) AS DOUBLE)
      |    / SUM(cnt)) * 1e8) / 100) / 1e6 + 0.0 AS risk_rate6
      |FROM classes GROUP BY event_type ORDER BY event_type""".stripMargin

  // ------------------------------------------------------------------
  // q137 — per-group linear trend (OLS slope/intercept): value regressed
  // on integer hour-of-corpus per event_type — the drift-DETECTION step
  // after q112's drift audit and q121's point anomalies (is the metric
  // moving, and how fast per hour?). Same sufficient-statistics
  // discipline as q118: ONE map-side-combinable pass accumulating
  // (n, Σx, Σy, Σxy, Σx²) with x an exact integer (µs floor-divided by
  // 3600e6 against a fixed epoch anchor — an affine shift,
  // slope-invariant) and EVERY sum decimal-exact; the closed forms
  //   slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²),  intercept = (Σy − b·Σx)/n
  // are evaluated as the identical IEEE expression tree in both engines
  // and rounded at 1e-6. At 100 TB this is a per-partition 5-value
  // partial + a 5-value reduce per group — the regression never sees a
  // second pass or a row-order-dependent float sum.
  //
  // Two exactness traps, both closed here:
  //  * Spark `div` and DuckDB `//` BOTH truncate toward zero (not
  //    floor), so the raw hour bin straddling the anchor is
  //    double-width for pre-anchor events; the explicit CASE turns
  //    truncation into floor division, identically on both sides
  //    (remainder sign is truncation-consistent in both engines).
  //  * Σx/Σx²/Σxy accumulate in DECIMAL on the Spark side — a LongType
  //    sum wraps silently on int64 overflow (non-ANSI) while DuckDB's
  //    SUM(BIGINT) promotes to HUGEINT; at ~1e11 rows with x² ≈ 1e8,
  //    Σx² exceeds int64 and the engines would diverge. decimal(38,·)
  //    holds Σx² to ~1e38 — centuries of corpus at 100 TB/day.
  // ------------------------------------------------------------------
  def q137GroupTrend(spark: SparkSession, dir: String): DataFrame = {
    def d(c: Column): Column = c.cast("double")
    val ev = Tables.events(spark, dir)
      .select(col("event_type"),
        expr("unix_micros(ts) - unix_micros(timestamp '2024-01-01 00:00:00')").as("us"),
        col("value").cast("decimal(18,2)").as("y"))
      .select(col("event_type"),
        expr("(us div 3600000000) + (CASE WHEN us < 0 AND us % 3600000000 != 0" +
          " THEN -1 ELSE 0 END)").cast("decimal(19,0)").as("x"),
        col("y"))
    val stats = ev.groupBy(col("event_type")).agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"),
      sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"))
    val slope = (d(col("n")) * d(col("sxy")) - d(col("sx")) * d(col("sy"))) /
      (d(col("n")) * d(col("sxx")) - d(col("sx")) * d(col("sx")))
    stats.select(col("event_type"), col("n"),
        graft.weather.WeatherPipeline.roundSafe(slope, 6).as("slope6"),
        graft.weather.WeatherPipeline.roundSafe(
          (d(col("sy")) - slope * d(col("sx"))) / d(col("n")), 6).as("intercept6"))
      .orderBy(col("event_type"))
  }

  val q137Sql: String =
    """WITH s AS (
      |  SELECT event_type, COUNT(*) AS n,
      |    SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy, SUM(x * x) AS sxx
      |  FROM (
      |    SELECT event_type,
      |      (us // 3600000000) + (CASE WHEN us < 0 AND us % 3600000000 != 0
      |        THEN -1 ELSE 0 END) AS x,
      |      y
      |    FROM (
      |      SELECT event_type,
      |        epoch_us(CAST(ts AS TIMESTAMP))
      |          - epoch_us(TIMESTAMP '2024-01-01 00:00:00') AS us,
      |        CAST(value AS DECIMAL(18,2)) AS y
      |      FROM events))
      |  GROUP BY event_type)
      |SELECT event_type, CAST(n AS BIGINT) AS n,
      |  round(round(
      |    ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |     / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
      |    * 1e8) / 1e2) / 1e6 + 0.0 AS slope6,
      |  round(round(
      |    ((CAST(sy AS DOUBLE)
      |      - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |         / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
      |        * CAST(sx AS DOUBLE))
      |     / CAST(n AS DOUBLE))
      |    * 1e8) / 1e2) / 1e6 + 0.0 AS intercept6
      |FROM s ORDER BY event_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary"  -> (q01PricingSummary _),
    "q02_filter_project"   -> (q02FilterProject _),
    "q03_time_window"      -> (q03TimeWindow _),
    "q04_completeness"     -> (q04Completeness _),
    "q05_regex_filter"     -> (q05RegexFilter _),
    "q06_broadcast_join"   -> (q06BroadcastJoin _),
    "q07_anti_join"        -> (q07AntiJoin _),
    "q08_semi_join"        -> (q08SemiJoin _),
    "q09_latest_snapshot"  -> (q09LatestSnapshot _),
    "q10_asof_mae"         -> (q10AsofMae _),
    "q11_lag_consistency"  -> (q11LagConsistency _),
    "q12_latest_per_key"   -> (q12LatestPerKey _),
    "q13_topk"             -> (q13TopK _),
    "q14_union_report"     -> (q14UnionReport _),
    "q15_conditional_counts" -> (q15ConditionalCounts _),
    "q16_scalar_functions" -> (q16ScalarFunctions _),
    "q17_json_extract"     -> (q17JsonExtract _),
    "q18_upsert_last_wins" -> (q18UpsertLastWins _),
    "q19_upsert_first_wins" -> (q19UpsertFirstWins _),
    "q30_array_ops"        -> (q30ArrayOps _),
    "q33_percentiles"      -> (q33Percentiles _),
    "q34_approx_distinct"  -> (q34ApproxDistinct _),
    "q35_multi_join"       -> (q35MultiJoin _),
    "q36_window_frames"    -> (q36WindowFrames _),
    "q60_set_ops"          -> (q60SetOps _),
    "q61_rollup"           -> (q61Rollup _),
    "q67_salted_join"      -> (q67SaltedJoin _),
    "q68_range_join"       -> (q68RangeJoin _),
    "q69_approx_percentile" -> (q69ApproxPercentile _),
    "q74_pivot"            -> (q74Pivot _),
    "q75_asof_features"    -> (q75AsofFeatures _),
    "q76_quantize_embeddings" -> (q76QuantizeEmbeddings _),
    "q79_scd2_dimension"   -> (q79Scd2Dimension _),
    "q88_unpivot"          -> (q88Unpivot _),
    "q90_cube"             -> (q90Cube _),
    "q91_rank_functions"   -> (q91RankFunctions _),
    "q106_argmax"          -> (q106Argmax _),
    "q108_gap_fill"        -> (q108GapFill _),
    "q109_fk_audit"        -> (q109FkAudit _),
    "q112_snapshot_drift"  -> (q112SnapshotDrift _),
    "q115_point_in_time"   -> (q115PointInTime _),
    "q116_funnel"          -> (q116Funnel _),
    "q117_cohort_retention" -> (q117CohortRetention _),
    "q119_sessionization"  -> (q119Sessionization _),
    "q121_anomaly_zscore"  -> (q121AnomalyZscore _),
    "q122_rolling_features" -> (q122RollingFeatures _),
    "q124_ewma_features"   -> (q124EwmaFeatures _),
    "q125_triangles"       -> (q125Triangles _),
    "q127_rolling_7d"      -> (q127Rolling7d _),
    "q128_markov_transitions" -> (q128MarkovTransitions _),
    "q137_group_trend"     -> (q137GroupTrend _),
    "q129_decile_binning"  -> (q129DecileBinning _),
    "q130_pagerank"        -> (q130Pagerank _),
    "q131_optout_purge"    -> (q131OptoutPurge _),
    "q132_kanonymity"      -> (q132Kanonymity _),
  )

  val oracleSql: Map[String, String] = Map(
    "q01_pricing_summary"  -> q01Sql,
    "q02_filter_project"   -> q02Sql,
    "q03_time_window"      -> q03Sql,
    "q04_completeness"     -> q04Sql,
    "q05_regex_filter"     -> q05Sql,
    "q06_broadcast_join"   -> q06Sql,
    "q07_anti_join"        -> q07Sql,
    "q08_semi_join"        -> q08Sql,
    "q09_latest_snapshot"  -> q09Sql,
    "q10_asof_mae"         -> q10Sql,
    "q11_lag_consistency"  -> q11Sql,
    "q12_latest_per_key"   -> q12Sql,
    "q13_topk"             -> q13Sql,
    "q14_union_report"     -> q14Sql,
    "q15_conditional_counts" -> q15Sql,
    "q16_scalar_functions" -> q16Sql,
    "q17_json_extract"     -> q17Sql,
    "q18_upsert_last_wins" -> q18Sql,
    "q19_upsert_first_wins" -> q19Sql,
    "q30_array_ops"        -> q30Sql,
    "q33_percentiles"      -> q33Sql,
    "q34_approx_distinct"  -> q34Sql,
    "q35_multi_join"       -> q35Sql,
    "q36_window_frames"    -> q36Sql,
    "q60_set_ops"          -> q60Sql,
    "q61_rollup"           -> q61Sql,
    "q67_salted_join"      -> q67Sql,
    "q68_range_join"       -> q68Sql,
    "q69_approx_percentile" -> q69Sql,
    "q74_pivot"            -> q74Sql,
    "q75_asof_features"    -> q75Sql,
    "q76_quantize_embeddings" -> q76Sql,
    "q79_scd2_dimension"   -> q79Sql,
    "q88_unpivot"          -> q88Sql,
    "q90_cube"             -> q90Sql,
    "q91_rank_functions"   -> q91Sql,
    "q106_argmax"          -> q106Sql,
    "q108_gap_fill"        -> q108Sql,
    "q109_fk_audit"        -> q109Sql,
    "q112_snapshot_drift"  -> q112Sql,
    "q115_point_in_time"   -> q115Sql,
    "q116_funnel"          -> q116Sql,
    "q117_cohort_retention" -> q117Sql,
    "q119_sessionization"  -> q119Sql,
    "q121_anomaly_zscore"  -> q121Sql,
    "q122_rolling_features" -> q122Sql,
    "q124_ewma_features"   -> q124Sql,
    "q125_triangles"       -> q125Sql,
    "q127_rolling_7d"      -> q127Sql,
    "q128_markov_transitions" -> q128Sql,
    "q137_group_trend"     -> q137Sql,
    "q129_decile_binning"  -> q129Sql,
    "q130_pagerank"        -> q130Sql,
    "q131_optout_purge"    -> q131Sql,
    "q132_kanonymity"      -> q132Sql,
  )
}
