package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.functions._

import graft.weather.{WeatherPipeline, WeatherQueries, WeatherZServe}
import graft.plans.ZoneMapFileIndex

/** The weather serve path over the z-clustered gold layout. Pins:
  * (1) q27's (postal, time-window) predicate opens files_opened ≪
  *     files_total through the FileIndex — the reference's composite
  *     B-tree serve path (`sql/schema.sql:278-305`) as zone skipping;
  * (2) all three serve queries (q24/q25/q27) return EXACTLY the rows
  *     the in-memory pipeline frames produce — the layout moves the
  *     scan, never the answer (the driver's unchanged oracles pin the
  *     same thing against DuckDB);
  * (3) the executed plan's scan runs over [[ZoneMapFileIndex]]. */
class WeatherZServeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def zoneScans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      zoneScans(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      zoneScans(q.plan)
    case s: FileSourceScanExec => Seq(s)
    case other => other.children.flatMap(zoneScans)
  }

  test("q27 history rides the zone-mapped relation: postal + window " +
      "prune most files; rows identical to the in-memory gold") {
    val (zdf, idx) = WeatherZServe.zGoldWithIndex(spark, dir)
    val served = WeatherPipeline.history(zdf, "10011", 72, 24)
      .orderBy(col("timestamp"))
    val zRows = served.collect().toSeq
    val (total, kept) = (idx.lastTotal.get(), idx.lastKept.get())
    assert(zRows.nonEmpty, "the fixture postal must have history rows")
    val memRows = WeatherPipeline.history(
        WeatherQueries.goldUnified(spark, dir), "10011", 72, 24)
      .orderBy(col("timestamp")).collect().toSeq
    assert(zRows === memRows,
      "the z-served history must equal the pipeline-served history")
    assert(kept < total / 2,
      s"one postal × 72h must prune most of the clustered layout " +
        s"(opened $kept of $total)")
    val scans = zoneScans(served.queryExecution.executedPlan)
    assert(scans.exists(_.relation.location.isInstanceOf[ZoneMapFileIndex]),
      "the serve scan must run over the zone-mapped FileIndex")
  }

  test("q177 region rollup: the postal PREFIX pushes as StartsWith, " +
      "prunes files, and equals the in-memory computation") {
    val (zdf, idx) = WeatherZServe.zGoldWithIndex(spark, dir)
    def rollup(df: org.apache.spark.sql.DataFrame) = df
      .filter(col("data_type") === "observation" &&
        col("postal_code").startsWith("1001") &&
        col("timestamp") >= lit(WeatherPipeline.AsOf).cast("timestamp") -
          expr("INTERVAL 72 HOURS"))
      .groupBy(col("postal_code"))
      .agg(count(lit(1)).as("n_rows"),
        max(col("temperature_max")).as("max_temp"),
        min(col("temperature_min")).as("min_temp"),
        sum(col("num_stations").cast("long")).as("sum_stations"))
      .orderBy(col("postal_code"))
    val zRows = rollup(zdf).collect().toSeq
    val (total, kept) = (idx.lastTotal.get(), idx.lastKept.get())
    assert(zRows.nonEmpty)
    assert(zRows === rollup(WeatherQueries.goldUnified(spark, dir))
      .collect().toSeq)
    assert(kept < total,
      s"the 1001x prefix + 72h window must refute at least some files " +
        s"(opened $kept of $total)")
  }

  test("q24/q25 latest snapshots off the z-relation equal the " +
      "in-memory frames") {
    val zdf = WeatherZServe.zGold(spark, dir)
    val gold = WeatherQueries.goldUnified(spark, dir)

    val zObs = WeatherPipeline.latestObservations(zdf)
      .orderBy(col("postal_code")).collect().toSeq
    val mObs = WeatherPipeline.latestObservations(gold)
      .orderBy(col("postal_code")).collect().toSeq
    assert(zObs.nonEmpty && zObs === mObs)

    val zFc = WeatherPipeline.latestForecasts(zdf)
      .orderBy(col("postal_code"), col("target_time")).collect().toSeq
    val mFc = WeatherPipeline.latestForecasts(gold)
      .orderBy(col("postal_code"), col("target_time")).collect().toSeq
    assert(zFc.nonEmpty && zFc === mFc)
  }
}
