package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Layout

/** The physical claim behind q99: range-partitioning on the Morton code
  * gives every partition a TIGHT value range on BOTH source dimensions at
  * once, where a single-column sort is tight on that column only and a
  * hash layout is tight on neither. Tight per-partition (= per-file)
  * ranges are what make parquet footer min/max stats prune scans for
  * predicates on EITHER column — the lake-side replacement for the
  * reference's composite B-tree indexes (`sql/schema.sql:295-305`).
  */
class ZorderSpec extends SparkSpec {

  /** Mean normalized (min,max) extent of `c` across the partitions of
    * `df`, computed distributively via spark_partition_id. */
  private def meanExtent(df: DataFrame, c: String): Double = {
    val bounds = df.agg(min(col(c)).as("lo"), max(col(c)).as("hi"))
    val row = df.withColumn("__pid", spark_partition_id())
      .groupBy(col("__pid"))
      .agg(min(col(c)).as("pmin"), max(col(c)).as("pmax"))
      .crossJoin(broadcast(bounds))
      .agg(avg((col("pmax") - col("pmin")).cast("double") /
        (col("hi") - col("lo")))).head()
    row.getDouble(0)
  }

  test("z-order clustering bounds per-partition extents on BOTH dimensions") {
    val li = graft.sources.Tables.lineitem(spark, Sf)
      .select(col("l_partkey"), col("l_orderkey"))

    val z = Layout.clusterByZ(li, "l_partkey", "l_orderkey", 16)
    val zPart = meanExtent(z, "l_partkey")
    val zOrd = meanExtent(z, "l_orderkey")
    // 16 partitions = 2 z-bits per dimension → ideal extent 0.25; range-
    // partitioner sampling noise can straddle a boundary, so gate at 0.6
    assert(zPart <= 0.6, s"z-order l_partkey extent $zPart")
    assert(zOrd <= 0.6, s"z-order l_orderkey extent $zOrd")

    // single-column sort: tight on the sorted column, useless on the other
    val sorted = li.repartitionByRange(16, col("l_partkey"))
    val sPart = meanExtent(sorted, "l_partkey")
    val sOrd = meanExtent(sorted, "l_orderkey")
    assert(sPart <= 0.2, s"sorted l_partkey extent $sPart")
    assert(sOrd >= 0.9, s"sorted layout should NOT bound l_orderkey, got $sOrd")

    // hash layout: tight on neither
    val hashed = li.repartition(16)
    assert(meanExtent(hashed, "l_partkey") >= 0.9)
    assert(meanExtent(hashed, "l_orderkey") >= 0.9)
  }
}
