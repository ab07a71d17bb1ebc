package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.{Bronze, Tables}

/** Proves the µs-normalized bronze landing turns the documented events
  * scan caveat into reader-level pruning: the same time predicate that is
  * invisible on the raw nanos feed reaches `PushedFilters` (row-group
  * stats) and the partition column prunes directories.
  */
class BronzeSpec extends SparkSpec {

  private val cut = "2024-01-15 00:00:00"

  test("raw feed pushdown tracks the corpus generation (the caveat)") {
    // nanos-generation corpora: the >= bound stays above the
    // timestamp_micros conversion, only IsNotNull(ts) reaches the reader
    // and every row group is read — the caveat bronze landing fixes.
    // µs-generation corpora: Catalyst unwraps the NTZ→LTZ cast and the
    // bound DOES reach PushedFilters — no caveat; bronze's remaining
    // scale value there is the event_date partition pruning (next test).
    val rawIsNanos = {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$Sf/events.parquet").schema("ts")
        .dataType == org.apache.spark.sql.types.LongType
    }
    val plan = Tables.events(spark, Sf)
      .filter(col("ts") >= lit(cut).cast("timestamp"))
      .queryExecution.executedPlan.toString
    if (rawIsNanos) assert(!plan.contains("GreaterThanOrEqual(ts"), plan)
    else assert(plan.contains("GreaterThanOrEqual(ts"), plan)
  }

  test("bronze landing pushes ts to the reader and prunes partitions") {
    val path = Files.createTempDirectory("graft_bronze").toString + "/events"
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
