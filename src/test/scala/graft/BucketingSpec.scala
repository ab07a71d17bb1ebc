package graft

import org.apache.spark.sql.functions._
import graft.weather.WeatherSynth

/** Backs the README's bucketed-bronze claim with plan evidence: landing
  * the staging table bucketed by `station_id` (the dedup/merge key —
  * reference analogue: the B-tree/BRIN strategy in `sql/schema.sql:
  * 269-305`) lets every downstream per-station operator reuse the storage
  * partitioning, so the pre-aggregation/window Exchange disappears.
  */
class BucketingSpec extends SparkSpec {

  private def countExchanges(plan: String): Int =
    "(?m)^.*Exchange hashpartitioning".r.findAllIn(plan).size

  test("bucketed-by-station_id staging removes the per-station shuffle") {
    val wh = TempDirs.create("graft_bucket")
    val stg = WeatherSynth.rawObservations(spark, Sf)
      .select("raw_id", "station_id", "timestamp", "temperature")

    stg.write.mode("overwrite").parquet(s"$wh/flat")
    stg.write.mode("overwrite")
      .bucketBy(8, "station_id").sortBy("station_id", "timestamp")
      .option("path", s"$wh/bucketed")
      .saveAsTable("stg_bucketed")
    try {
      def perStation(df: org.apache.spark.sql.DataFrame) =
        df.groupBy("station_id").agg(count(lit(1)).as("n"), avg("temperature").as("t"))

      val flatPlan = perStation(spark.read.parquet(s"$wh/flat"))
        .queryExecution.executedPlan.toString
      val bucketedPlan = perStation(spark.table("stg_bucketed"))
        .queryExecution.executedPlan.toString

      assert(countExchanges(flatPlan) === 1, flatPlan)
      assert(countExchanges(bucketedPlan) === 0, bucketedPlan)

      // the staging dedup window (PARTITION BY station_id, timestamp) also
      // rides the bucketing: HashPartitioning(station_id) clusters every
      // (station_id, timestamp) group into one partition
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("station_id"), col("timestamp"))
        .orderBy(col("raw_id").desc)
      val dedupPlan = spark.table("stg_bucketed")
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .queryExecution.executedPlan.toString
      assert(countExchanges(dedupPlan) === 0, dedupPlan)

      // same values either way
      assert(perStation(spark.table("stg_bucketed")).exceptAll(
        perStation(spark.read.parquet(s"$wh/flat"))).count() === 0)
    } finally spark.sql("DROP TABLE IF EXISTS stg_bucketed")
  }
}
