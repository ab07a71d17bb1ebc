package graft

import org.apache.spark.sql.functions._

/** AQE's skew-join split — the first line of defense before manual
  * salting (SkewJoin): a hot key that dwarfs the advisory partition size
  * gets split at runtime, visible as `skew=true` on the sort-merge join
  * in the final adaptive plan.
  */
class AqeSkewSpec extends SparkSpec {

  test("AQE splits a skewed sort-merge join at runtime") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "100KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "100KB")
      conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "16KB")

      // ~95% of the big side lands on key 1 → one shuffle partition far
      // beyond the 100KB threshold
      val big = spark.range(0, 400000).select(
        when(col("id") % 20 =!= 0, lit(1L)).otherwise(col("id")).as("k"),
        col("id").as("v"))
      val dim = spark.range(0, 4000).select(col("id").as("k"), (col("id") * 2).as("w"))
      val joined = big.join(dim, "k")

      // run THIS queryExecution (count() would spawn a different one)
      assert(joined.collect().length === 400000 - 400000 / 20 + 4000 / 20)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("isFinalPlan=true"), finalPlan)
      assert(finalPlan.contains("skew=true"), finalPlan)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
