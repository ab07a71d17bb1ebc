package graft

import org.apache.spark.sql.functions._

class ApproxSpec extends SparkSpec {

  test("approx_count_distinct stays within 5% of exact at rsd=0.02") {
    val rows = graft.operators.Relational.q34ApproxDistinct(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_users").toDouble
      val approx = r.getAs[Long]("approx_users").toDouble
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"${r.getString(0)}: exact=$exact approx=$approx")
    }
  }
}
