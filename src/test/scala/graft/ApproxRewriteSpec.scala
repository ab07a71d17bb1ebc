package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Layout

/** ApproxDistinctRewrite: COUNT(DISTINCT e) must be untouched with the
  * flag off, must plan as the KmvSketch aggregate (no distinct-count
  * anywhere) with the flag on, must return the exact count below
  * saturation, must match the closed-form estimate above it, and must
  * carry FILTER clauses through the rewrite. The extension-injected
  * path is exercised via [[SparkSpec.withExtSession]] (the
  * spark.sql.extensions wiring a SQL-only user gets); the
  * extraOptimizations path via the q152 wrapper on the shared session.
  */
class ApproxRewriteSpec extends SparkSpec {

  private val Sf01 = "/root/testdata/sf0.01"
  private val Flag = "spark.graft.approx.countDistinct"

  private def withFlag[T](s: SparkSession)(f: => T): T = {
    s.conf.set(Flag, "true")
    try f finally s.conf.unset(Flag)
  }

  private def view(s: SparkSession, dir: String): Unit =
    graft.sources.Tables.events(s, dir)
      .filter(col("user_id").isNotNull)
      .createOrReplaceTempView("approx_spec_events")

  test("flag off: plan and results are the exact distinct count") {
    withExtSession { s =>
      view(s, Sf)
      val df = s.sql(
        "SELECT event_type, count(DISTINCT user_id) AS n FROM approx_spec_events GROUP BY 1")
      assert(!df.queryExecution.optimizedPlan.toString.contains("graft_kmv"))
      df.collect().foreach(r => assert(r.getLong(1) === 15L)) // sf0.001 truth
    }
  }

  test("flag on: plans as the sketch, exact below saturation, estimate above") {
    withExtSession { s =>
      view(s, Sf)
      withFlag(s) {
        val df = s.sql(
          "SELECT event_type, count(DISTINCT user_id) AS n FROM approx_spec_events GROUP BY 1")
        val plan = df.queryExecution.optimizedPlan.toString
        assert(plan.contains("graft_kmv"), s"rewrite did not fire:\n$plan")
        assert(!plan.toLowerCase.contains("count(distinct"),
          "no exact distinct count may remain in the rewritten plan")
        // 15 users/type < k=64: saturation returns the EXACT count
        df.collect().foreach(r => assert(r.getLong(1) === 15L))
      }
      // sf0.01: 150 users/type > k -> closed-form estimate, rounded long
      view(s, Sf01)
      val expected = graft.sources.Tables.events(s, Sf01)
        .filter(col("user_id").isNotNull)
        .select(col("event_type"), md5(col("user_id").cast("string")).as("h"))
        .distinct()
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("event_type")).orderBy(col("h"))))
        .filter(col("rn") === 64)
        .select(col("event_type"), col("h")).collect()
        .map { r =>
          val uk = java.lang.Long.parseLong(r.getString(1).substring(0, 12), 16) /
            281474976710656.0
          r.getString(0) -> math.round(63.0 / uk)
        }.toMap
      withFlag(s) {
        val got = s.sql(
          "SELECT event_type, count(DISTINCT user_id) AS n FROM approx_spec_events GROUP BY 1")
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        assert(got === expected)
      }
    }
  }

  test("flag on: FILTER clauses and plain counts ride through unchanged") {
    withExtSession { s =>
      view(s, Sf)
      val sql =
        """SELECT event_type, count(*) AS n_rows,
           count(DISTINCT user_id) FILTER (WHERE user_id % 2 = 0) AS n_even
           FROM approx_spec_events GROUP BY 1"""
      val exact = s.sql(sql).collect().map(_.toSeq).toSet
      withFlag(s) {
        val approx = s.sql(sql)
        assert(approx.queryExecution.optimizedPlan.toString.contains("graft_kmv"))
        // saturated data: filtered distinct under the sketch == exact
        assert(approx.collect().map(_.toSeq).toSet === exact)
      }
    }
  }

  test("DataFrame-API count_distinct is rewritten too") {
    withExtSession { s =>
      withFlag(s) {
        val df = graft.sources.Tables.events(s, Sf)
          .filter(col("user_id").isNotNull)
          .groupBy(col("event_type"))
          .agg(count_distinct(col("user_id")).as("n"))
        assert(df.queryExecution.optimizedPlan.toString.contains("graft_kmv"))
        df.collect().foreach(r => assert(r.getAs[Long]("n") === 15L))
      }
    }
  }

  test("multi-argument COUNT(DISTINCT a, b) rewrites with tuple semantics") {
    withExtSession { s =>
      view(s, Sf)
      val sql =
        """SELECT count(DISTINCT event_type, user_id) AS n,
           count(DISTINCT user_id, event_type) AS n2
           FROM approx_spec_events
           WHERE event_type IN ('click', 'error', 'purchase')"""
      val exact = s.sql(sql).collect().head
      withFlag(s) {
        val df = s.sql(sql)
        assert(df.queryExecution.optimizedPlan.toString.contains("graft_kmv"))
        val got = df.collect().head
        // 3 types x 15 users = 45 tuples < k: saturation -> exact
        assert(got.getLong(0) === exact.getLong(0))
        assert(got.getLong(1) === exact.getLong(1))
      }
      // null-guard: rows with any null argument are excluded, as Count does
      import s.implicits._
      Seq(("a", Some(1)), ("a", None), (null, Some(2)), ("b", Some(1)))
        .toDF("x", "y").createOrReplaceTempView("approx_null_probe")
      val nsql = "SELECT count(DISTINCT x, y) AS n FROM approx_null_probe"
      val nExact = s.sql(nsql).collect().head.getLong(0)
      withFlag(s) {
        assert(s.sql(nsql).collect().head.getLong(0) === nExact)
      }
    }
  }

  test("pure-SQL users get the sketch aggregates via spark.sql.extensions") {
    withExtSession { s =>
      view(s, Sf)
      val r = s.sql(
        """SELECT event_type,
             graft_kmv(md5(CAST(user_id AS STRING)), 64) AS sk,
             size(graft_kmv_full(md5(CAST(user_id AS STRING)), 8)) AS n_full,
             size(graft_priority_sample(CAST(user_id AS STRING), CAST(1 AS BIGINT),
               CAST(user_id AS DOUBLE), 5)) AS n_ps,
             graft_kmv_freq(md5(CAST(user_id AS STRING)), 1L, 64) AS ksf,
             COUNT(user_id) AS n_rows
           FROM approx_spec_events WHERE user_id IS NOT NULL
           GROUP BY 1 ORDER BY 1""").collect()
      assert(r.nonEmpty)
      r.foreach { row =>
        // 15 distinct users/type at sf0.001
        assert(row.getAs[org.apache.spark.sql.Row]("sk").getAs[Int]("n_kept") === 15)
        assert(row.getAs[Int]("n_full") === 8)
        assert(row.getAs[Int]("n_ps") === 5)
        // the frequency KMV: unsaturated kept set == whole key set, so
        // the summed counts are the group's full row count
        val ksf = row.getSeq[org.apache.spark.sql.Row](row.fieldIndex("ksf"))
        assert(ksf.size === 15)
        assert(ksf.map(_.getLong(1)).sum === row.getAs[Long]("n_rows"))
      }
    }
  }

  test("q152 wrapper (extraOptimizations path on a plain session)") {
    val out = Layout.queries("q152_approx_rewrite")(spark, Sf01).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(math.abs(r.getAs[Double]("rel_err")) < 0.5)
      assert(r.getAs[Long]("n_exact") === 150L)
    }
    // and at saturated scale the two columns are IDENTICAL
    Layout.queries("q152_approx_rewrite")(spark, Sf).collect().foreach { r =>
      assert(r.getAs[Long]("n_approx") === r.getAs[Long]("n_exact"))
      assert(r.getAs[Double]("rel_err") === 0.0)
    }
  }
}
