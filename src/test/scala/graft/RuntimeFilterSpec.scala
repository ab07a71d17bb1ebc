package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Row-level runtime filtering — the third pruning mode after static
  * pushdown (WeatherBronzeSpec) and dynamic partition pruning (DppSpec):
  * when a selective dimension filter reaches the fact only THROUGH a
  * shuffle join, Catalyst's InjectRuntimeFilter builds a bloom filter
  * from the dimension's join keys and applies `might_contain` on the
  * fact side BEFORE the exchange, so non-matching fact rows never enter
  * the shuffle. At 100 TB this is the difference between shuffling the
  * full fact table and shuffling the ~1% that can possibly join — the
  * row-granular analogue of the reference's FK indexes
  * (`sql/schema.sql:295-305`) for joins too fine-grained for partition
  * pruning.
  */
class RuntimeFilterSpec extends SparkSpec {

  test("a selective dim filter injects a bloom runtime filter on the fact scan side") {
    val confs = Map(
      // force the shuffle-join regime: broadcast joins don't need the
      // bloom (the dim rides to every task anyway)
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // test-scale scans are far below the 10 GB production threshold
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0")
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val li = Tables.lineitem(spark, Sf)
      val dim = Tables.part(spark, Sf).filter(col("p_brand") === "Brand#13")
      val q = li.join(dim, col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("qty"))
      val optimized = q.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"expected an injected bloom runtime filter, got:\n$optimized")
      // the filter is a pure pruning overlay — the answer is unchanged
      val withBloom = q.collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val without = li.join(dim, col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("qty"))
        .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
      assert(withBloom == without, s"bloom filter changed the result: $withBloom vs $without")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
