package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver-generated corpus (TESTDATA.md).
  *
  * All engine inputs come from `spark.read.parquet` — the reference's
  * PostgreSQL tables (`/root/reference/sql/schema.sql`) map to columnar
  * Parquet here (an upgrade the reference itself lists as future work,
  * reference `README.md:262`). Schemas are fixed by the files; we never
  * infer from JSON/CSV in the hot path.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** Corpus generations disagree on `ts`'s physical type: older corpora
    * store INT64 TIMESTAMP(NANOS) (which Spark's vectorized reader only
    * exposes as a raw long), newer ones native TIMESTAMP(MICROS) (which
    * Spark reads as TIMESTAMP_NTZ under the default
    * `inferTimestampNTZ`). Both land on µs-precision `TimestampType`:
    * the engine's canonical event-time currency, and the type every
    * oracle's `CAST(ts AS TIMESTAMP)` mirrors.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventsTs(load(s, d, "events"))
  }

  /** The ts-physical-type normalization [[events]] applies, factored so
    * file-subset readers (incremental maintenance scanning only NEW part
    * files, [[graft.operators.KmvTable]]) land on the identical
    * canonical µs TimestampType. Caller must have set
    * `spark.sql.legacy.parquet.nanosAsLong` before the read.
    */
  private[graft] def normalizeEventsTs(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // `div` = exact integer floor division. `/ 1000` would go through
        // DOUBLE, and epoch-ns longs (~1.7e18) exceed double's 2^53 exact
        // range — up to ~512 ns of rounding, which surfaced as ±1 µs
        // mismatches vs the oracle's exact ns→µs cast (found by q75).
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _: org.apache.spark.sql.types.TimestampNTZType =>
        // UTC session (bench/test contract): the NTZ→LTZ cast reuses the
        // stored micros verbatim — same instants DuckDB reads natively.
        raw.withColumn("ts", col("ts").cast("timestamp_ltz"))
      case _ => raw // already TimestampType
    }
  }

  /** The events feed in raw-nanos shape: `ts` as epoch-NANOS long — the
    * currency of the streaming harnesses (tranche splits, watermark
    * arithmetic, feed landings all compute in exact int64 ns). Adapts to
    * either on-disk generation like [[events]]; µs corpora are widened
    * `×1000` (exact — µs longs are far inside int64).
    */
  def eventsRawNanos(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    import org.apache.spark.sql.functions._
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => raw
      case _ =>
        raw.withColumn("ts",
          unix_micros(col("ts").cast("timestamp_ltz")) * lit(1000L))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
