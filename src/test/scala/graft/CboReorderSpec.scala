package graft

import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Cost-based join reordering: with catalog statistics (`ANALYZE TABLE`)
  * and `spark.sql.cbo.{enabled,joinReorder.enabled}`, Catalyst rewrites a
  * badly-written inner-join chain so the most selective join runs first —
  * the optimizer-side defense a declarative engine owes its users when
  * query text arrives in arbitrary join order (the reference relies on
  * Postgres's planner for exactly this; `EXPLAIN` in its docs). The spec
  * pins (a) stats propagate to the optimized plan, (b) the reorder
  * actually fires (the filtered 1-row dimension joins BEFORE the wide
  * dimension, though the SQL says otherwise), (c) results are unchanged.
  */
class CboReorderSpec extends SparkSpec {

  /** Left-deep leaf order of the join tree, by table-ish name. */
  private def leafOrder(p: LogicalPlan): Seq[String] = p.collect {
    case j: Join => j
  }.headOption.map(_.collectLeaves().map(_.toString.take(60)).toSeq)
    .getOrElse(Seq.empty)

  test("ANALYZE stats + CBO reorder a join chain; results unchanged") {
    val names = Seq("cbo_lineitem", "cbo_part", "cbo_supplier")
    names.foreach(n => spark.sql(s"DROP TABLE IF EXISTS $n"))
    try {
      // overwrite: an aborted prior run leaves the warehouse DIRECTORY on
      // disk with no metastore entry — DROP IF EXISTS is then a no-op and
      // a default ErrorIfExists create fails forever after
      Tables.lineitem(spark, Sf).write.mode("overwrite").saveAsTable("cbo_lineitem")
      Tables.part(spark, Sf).write.mode("overwrite").saveAsTable("cbo_part")
      Tables.supplier(spark, Sf).write.mode("overwrite").saveAsTable("cbo_supplier")
      names.foreach(n => spark.sql(s"ANALYZE TABLE $n COMPUTE STATISTICS FOR ALL COLUMNS"))

      // written WORST-first: the unfiltered wide part join before the
      // 1-row supplier probe. The filter sits on a NON-join column
      // deliberately — a join-key filter (s_suppkey = k) is transitively
      // pushed onto the fact by constraint propagation, after which the
      // SQL order is already near-optimal and the reorder rationally
      // stays put (observed; the cost model is right to do so).
      val sql =
        """SELECT l.l_orderkey, p.p_brand, s.s_name
          |FROM cbo_lineitem l
          |JOIN cbo_part p ON l.l_partkey = p.p_partkey
          |JOIN cbo_supplier s ON l.l_suppkey = s.s_suppkey
          |WHERE s.s_nationkey = 3""".stripMargin

      def run[T](cbo: Boolean)(f: => T): T = {
        val keys = Seq("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled")
        val saved = keys.map(k => k -> spark.conf.getOption(k))
        keys.foreach(k => spark.conf.set(k, cbo.toString))
        try f finally saved.foreach {
          case (k, Some(v)) => spark.conf.set(k, v)
          case (k, None)    => spark.conf.unset(k)
        }
      }

      val (orderOff, rowsOff) = run(cbo = false) {
        val df = spark.sql(sql)
        (leafOrder(df.queryExecution.optimizedPlan),
          df.orderBy(col("l_orderkey"), col("p_brand")).collect().toSeq)
      }
      val (orderOn, rowsOn) = run(cbo = true) {
        // row-level stats reach the optimizer only under CBO
        val rc = spark.table("cbo_lineitem").queryExecution.optimizedPlan.stats.rowCount
        assert(rc.isDefined && rc.get.toLong > 0, s"expected analyzed rowCount, got $rc")
        val df = spark.sql(sql)
        (leafOrder(df.queryExecution.optimizedPlan),
          df.orderBy(col("l_orderkey"), col("p_brand")).collect().toSeq)
      }
      assert(orderOff.nonEmpty && orderOn.nonEmpty)
      val supplierPosOff = orderOff.indexWhere(_.contains("cbo_supplier"))
      val supplierPosOn = orderOn.indexWhere(_.contains("cbo_supplier"))
      val partPosOn = orderOn.indexWhere(_.contains("cbo_part"))
      assert(supplierPosOff === 2, s"rule-only plan should keep SQL order, got $orderOff")
      assert(supplierPosOn < partPosOn,
        s"CBO should join the 1-row supplier before the wide part dim, got $orderOn")
      assert(rowsOn === rowsOff, "reorder must not change the result")
    } finally names.foreach(n => spark.sql(s"DROP TABLE IF EXISTS $n"))
  }
}
