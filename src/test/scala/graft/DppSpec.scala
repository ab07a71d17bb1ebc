package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import graft.sources.Bronze

/** Dynamic partition pruning on the date-partitioned bronze fact — the
  * runtime analogue of the reference's composite FK indexes
  * (`sql/schema.sql:295-305`): when the day filter arrives THROUGH a join
  * (a filtered dimension), the fact scan must still prune to the matching
  * day directories at runtime, not scan the table. Static pruning (the
  * filter written on the fact itself) is already pinned by
  * BronzeSpec/WeatherBronzeSpec; this covers the join-delivered case.
  */
class DppSpec extends SparkSpec {

  test("a filtered dimension join prunes bronze day partitions at runtime") {
    val base = TempDirs.create("graft_dpp")
    Bronze.landEvents(spark, Sf, s"$base/bronze")

    // day dimension over the fact's own partition values, with an
    // attribute the query filters on (selecting a strict subset of days)
    val allDays = spark.read.parquet(s"$base/bronze")
      .select(col("event_date")).distinct()
      .orderBy(col("event_date")).collect().map(_.getDate(0).toString)
    assert(allDays.length >= 4, s"need several days, got ${allDays.length}")
    val hotFrom = allDays(allDays.length / 2)
    // the attribute must be something Spark's isLikelySelective heuristic
    // recognizes as a pruning filter — an equality on a label column (a
    // bare boolean attribute is NOT "likely selective" and disables DPP)
    spark.read.parquet(s"$base/bronze")
      .select(col("event_date")).distinct()
      .withColumn("label",
        when(col("event_date") >= lit(hotFrom).cast("date"), "hot").otherwise("cold"))
      .write.parquet(s"$base/dim")
    val expectedDays = allDays.count(_ >= hotFrom)
    assert(expectedDays < allDays.length, "filter must be selective for the test to mean anything")

    // AQE off so the executed plan is statically inspectable; DPP itself
    // is on by default (reuseBroadcastOnly: the dim broadcast the join
    // needs anyway doubles as the pruning subquery — zero extra cost)
    val savedAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val fact = spark.read.parquet(s"$base/bronze")
      val dim = spark.read.parquet(s"$base/dim").filter(col("label") === "hot")
      val q = fact.join(dim, Seq("event_date"))
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      val rows = q.collect()
      assert(rows.nonEmpty)

      val plan = q.queryExecution.executedPlan
      // the fact scan carries a runtime pruning predicate on event_date
      assert(plan.toString.toLowerCase.contains("dynamicpruningexpression"),
        s"no DynamicPruningExpression in:\n$plan")
      // and it actually pruned: the scan read exactly the hot days
      val factScan = plan.collectLeaves().collectFirst {
        case f: FileSourceScanExec if f.metrics.contains("numPartitions") &&
          f.output.exists(_.name == "event_type") => f
      }.getOrElse(fail(s"no partitioned fact scan in:\n$plan"))
      assert(factScan.metrics("numPartitions").value === expectedDays,
        s"expected $expectedDays partitions read, got ${factScan.metrics("numPartitions").value}")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", savedAqe)
      val p = new org.apache.hadoop.fs.Path(base)
      p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    }
  }
}
