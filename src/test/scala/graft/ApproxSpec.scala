package graft

class ApproxSpec extends SparkSpec {

  test("approx_count_distinct stays within 5% of exact at rsd=0.02") {
    val rows = graft.operators.Relational.q34ApproxDistinct(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("approx_users_ok") == 1,
        s"${r.getString(0)}: approx_users outside 5% of exact=${r.getAs[Long]("exact_users")}")
      assert(r.getAs[Int]("approx_events_ok") == 1,
        s"${r.getString(0)}: approx_events outside 5% of exact=${r.getAs[Long]("exact_events")}")
    }
  }
}
