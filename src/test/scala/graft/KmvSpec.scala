package graft

import org.apache.spark.sql.functions._
import graft.operators.Layout

/** q139 KMV sketch: the bucket-pruned bottom-k must equal the naive
  * per-type window definition exactly (the 4-hex-prefix pruning is a
  * scale shape, never a semantics change), the estimator must be the
  * closed form over the k-th smallest hash, and a type with fewer than
  * k distinct users must take the saturation rule (estimate == exact).
  */
class KmvSpec extends SparkSpec {

  test("bucket-pruned bottom-k matches the naive window and the closed-form estimator") {
    val out = Layout.queries("q139_kmv_distinct")(spark, Sf).collect()
    assert(out.nonEmpty)
    val ev = graft.sources.Tables.events(spark, Sf)
      .filter(col("user_id").isNotNull)
      .select(col("event_type"), md5(col("user_id").cast("string")).as("h"))
      .distinct()
    val naive = ev.withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_type")).orderBy(col("h"))))
      .filter(col("rn") <= 64)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_kept"), max(col("h")).as("hk"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getString(2))).toMap
    out.foreach { r =>
      val t = r.getAs[String]("event_type")
      val (nKept, hk) = naive(t)
      val est = r.getAs[Double]("kmv_estimate")
      val exact = r.getAs[Long]("n_distinct")
      if (nKept < 64) assert(est === exact.toDouble) // saturation rule
      else {
        val uk = java.lang.Long.parseLong(hk.substring(0, 12), 16) / 281474976710656.0
        assert(est === 63.0 / uk)
        // k=64 KMV has ~12.5% relative std error; 4x that is a hard bound
        assert(math.abs(r.getAs[Double]("rel_err")) < 0.5)
      }
    }
  }

  test("a type under k distinct users saturates to the exact count") {
    import spark.implicits._
    val dir = TempDirs.create("graft_kmv_small")
    // 40 distinct users (< k=64) over one type, plus a 200-user type
    val rows =
      (1 to 500).map(i => (i.toLong, 1700000000000000000L + i * 1000L, (i % 40 + 1).toLong, "tiny", 1.0)) ++
      (501 to 1500).map(i => (i.toLong, 1700000000000000000L + i * 1000L, (i % 200 + 1000).toLong, "big", 1.0))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$dir/events.parquet")
    val out = Layout.queries("q139_kmv_distinct")(spark, dir)
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    assert(out("tiny").getAs[Double]("kmv_estimate") === 40.0)
    assert(out("tiny").getAs[Double]("rel_err") === 0.0)
    assert(out("big").getAs[Long]("n_distinct") === 200L)
    assert(out("big").getAs[Double]("kmv_estimate") !== 200.0) // estimator path
  }
}
