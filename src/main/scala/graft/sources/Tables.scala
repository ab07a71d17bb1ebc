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
  /** events.parquet stores `ts` as INT64 TIMESTAMP(NANOS) which the Spark
    * vectorized reader rejects; read nanos as long and floor to
    * microseconds (`timestamp_micros(ns div 1000)`) — same truncation an
    * oracle engine reading nanos natively applies at µs precision.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    import org.apache.spark.sql.functions._
    // `div` = exact integer floor division. `/ 1000` would go through
    // DOUBLE, and epoch-ns longs (~1.7e18) exceed double's 2^53 exact
    // range — up to ~512 ns of rounding, which surfaced as ±1 µs
    // mismatches vs the oracle's exact ns→µs cast (found by q75).
    raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
