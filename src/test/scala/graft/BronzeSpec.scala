package graft

import org.apache.spark.sql.functions._
import graft.sources.{Bronze, Tables}

/** Proves the µs-normalized bronze landing turns the documented events
  * scan caveat into reader-level pruning: the same time predicate that is
  * invisible on the raw nanos feed reaches `PushedFilters` (row-group
  * stats) and the partition column prunes directories.
  */
class BronzeSpec extends SparkSpec {

  private val cut = "2024-01-15 00:00:00"

  test("raw feed pushdown, both corpus generations (the caveat)") {
    // Both generation arms run on in-test fixtures so neither assertion
    // can rot when the local corpus happens to be the other generation
    // (pre-r7 this test branched on the corpus and exercised one arm).
    import spark.implicits._
    val cutTs = lit(cut).cast("timestamp")

    // µs-generation arm: native TIMESTAMP(MICROS) [NTZ] — Catalyst
    // unwraps the NTZ→LTZ cast (UTC session) and the >= bound DOES
    // reach PushedFilters; bronze's remaining scale value there is the
    // event_date partition pruning (next test).
    val usDir = TempDirs.create("graft_us_gen")
    Seq(("2024-01-14 12:00:00", 1L), ("2024-01-16 12:00:00", 2L))
      .toDF("ts_s", "event_id")
      .select(col("ts_s").cast("timestamp_ntz").as("ts"), col("event_id"))
      .write.parquet(s"$usDir/events.parquet")
    val usPlan = Tables.events(spark, usDir)
      .filter(col("ts") >= cutTs).queryExecution.executedPlan.toString
    assert(usPlan.matches("(?s).*PushedFilters: \\[[^\\]]*GreaterThanOrEqual\\(ts[^\\]]*\\].*"), usPlan)

    // nanos-generation arm: ts as INT64 epoch-ns. Spark cannot WRITE
    // TIMESTAMP(NANOS), but under nanosAsLong the real nanos corpus
    // reads as exactly the LongType this plain-INT64 fixture does, and
    // what blocks pushdown is the µs conversion arithmetic in
    // Tables.events, not the parquet annotation. Only IsNotNull reaches
    // the reader — the caveat the bronze landing fixes.
    val nsDir = TempDirs.create("graft_ns_gen")
    Seq((1705190400000000000L, 1L), (1705363200000000000L, 2L))
      .toDF("ts", "event_id")
      .write.parquet(s"$nsDir/events.parquet")
    val nsPlan = Tables.events(spark, nsDir)
      .filter(col("ts") >= cutTs).queryExecution.executedPlan.toString
    assert(!nsPlan.contains("GreaterThanOrEqual(ts"), nsPlan)
    // and the conversion itself is exact: ns div 1000 keeps µs precision
    val got = Tables.events(spark, nsDir).agg(min("ts")).collect()(0).getTimestamp(0)
    assert(got.toInstant == java.time.Instant.parse("2024-01-14T00:00:00Z"))
  }

  test("bronze landing pushes ts to the reader and prunes partitions") {
    val path = TempDirs.create("graft_bronze") + "/events"
    Bronze.landEvents(spark, Sf, path)

    val tsPlan = Bronze.events(spark, path)
      .filter(col("ts") >= lit(cut).cast("timestamp"))
      .queryExecution.executedPlan.toString
    assert(tsPlan.matches("(?s).*PushedFilters: \\[[^\\]]*GreaterThanOrEqual\\(ts[^\\]]*\\].*"), tsPlan)

    val datePlan = Bronze.events(spark, path)
      .filter(col("event_date") === "2024-01-15")
      .queryExecution.executedPlan.toString
    assert(datePlan.contains("PartitionFilters") &&
      datePlan.matches("(?s).*PartitionFilters: \\[[^\\]]*event_date[^\\]]*\\].*"), datePlan)

    // and the landed rows are the same feed (same count, same ts floor)
    assert(Bronze.events(spark, path).count() === Tables.events(spark, Sf).count())
    val a = Bronze.events(spark, path).agg(max("ts")).collect()(0).getTimestamp(0)
    val b = Tables.events(spark, Sf).agg(max("ts")).collect()(0).getTimestamp(0)
    assert(a === b)
  }
}
