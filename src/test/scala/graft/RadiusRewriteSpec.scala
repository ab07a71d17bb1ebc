package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.weather.WeatherSynth

/** The RadiusJoinRewrite optimizer rule: a session with GraftExtensions
  * plans the naive cross-join + planar-radius filter as a grid-cell
  * equi-join (no BNLJ / cartesian), with results bit-identical to the
  * un-extended session.
  */
class RadiusRewriteSpec extends SparkSpec {

  private def naiveRadius(s: SparkSession): DataFrame = {
    val dLat = col("latitude") - col("centroid_lat")
    val dLon = col("longitude") - col("centroid_lon")
    WeatherSynth.postalCodes(s, Sf)
      .crossJoin(WeatherSynth.stations(s, Sf))
      .filter(sqrt(dLat * dLat + dLon * dLon) * 111.0 <= 50.0)
      .select(col("postal_code"), col("station_id"),
        graft.weather.WeatherPipeline.roundSafe(
          sqrt(dLat * dLat + dLon * dLon) * 111.0, 2).as("distance_km"))
  }

  test("naive radius join is rewritten to a hash equi-join on grid cells") {
    withExtSession { s =>
      val plan = naiveRadius(s).queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
      assert(!plan.contains("CartesianProduct"), plan)
      assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin"), plan)
      assert(plan.contains("__graft_cell"), plan)
    }
  }

  test("rewritten results are identical to the un-extended session's") {
    val expected = naiveRadius(spark).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).sortBy(t => (t._1, t._2))
    assert(expected.nonEmpty)
    withExtSession { s =>
      val got = naiveRadius(s).collect()
        .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).sortBy(t => (t._1, t._2))
      assert(got.toSeq === expected.toSeq)
    }
  }

  test("the 3x3 explode always lands on the smaller side") {
    withExtSession { s =>
      import org.apache.spark.sql.catalyst.plans.logical.Generate
      def coords(n: Long, prefix: String) = s.range(n).selectExpr(
        s"id AS ${prefix}_id",
        s"52.0 + CAST(id % 97 AS DOUBLE) / 50.0 AS ${prefix}_lat",
        s"12.5 + CAST(id % 89 AS DOUBLE) / 25.0 AS ${prefix}_lon")
      def generateSubtree(big: org.apache.spark.sql.DataFrame,
          small: org.apache.spark.sql.DataFrame): String = {
        val dLat = col("a_lat") - col("b_lat")
        val dLon = col("a_lon") - col("b_lon")
        val q = big.crossJoin(small)
          .filter(sqrt(dLat * dLat + dLon * dLon) * 111.0 <= 50.0)
        q.queryExecution.optimizedPlan.collect {
          case g: Generate => g.child.toString
        }.mkString
      }
      // big left (100k), small right (10): explode must sit over the 10-row side
      val t1 = generateSubtree(
        coords(100000, "a"), coords(10, "b"))
      assert(t1.contains("(0, 10,"), t1)
      // flipped: small left, big right — explode still on the 10-row side
      val t2 = generateSubtree(
        coords(10, "a"), coords(100000, "b"))
      assert(t2.contains("(0, 10,"), t2)
    }
  }

  private def naiveHaversine(s: SparkSession): DataFrame = {
    import graft.functions.GeoFunctions
    val d = GeoFunctions.haversineKm(
      col("latitude"), col("longitude"), col("centroid_lat"), col("centroid_lon"))
    WeatherSynth.postalCodes(s, Sf)
      .crossJoin(WeatherSynth.stations(s, Sf))
      .filter(d <= 50.0)
      .select(col("postal_code"), col("station_id"),
        graft.weather.WeatherPipeline.roundSafe(d, 2).as("distance_km"))
  }

  test("haversine radius join is rewritten to a 3D chord-grid equi-join") {
    withExtSession { s =>
      val plan = naiveHaversine(s).queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
      assert(!plan.contains("CartesianProduct"), plan)
      assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin"), plan)
      assert(plan.contains("__graft_cell"), plan)
    }
  }

  test("haversine rewrite results are identical to the un-extended session's") {
    val expected = naiveHaversine(spark).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).sortBy(t => (t._1, t._2))
    assert(expected.nonEmpty)
    withExtSession { s =>
      val got = naiveHaversine(s).collect()
        .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).sortBy(t => (t._1, t._2))
      assert(got.toSeq === expected.toSeq)
    }
  }

  test("SQL graft_haversine_km radius predicate is rewritten too") {
    withExtSession { s =>
      WeatherSynth.postalCodes(s, Sf).createOrReplaceTempView("pc")
      WeatherSynth.stations(s, Sf).createOrReplaceTempView("st")
      val q = s.sql(
        """SELECT postal_code, station_id FROM pc JOIN st
          |ON graft_haversine_km(latitude, longitude, centroid_lat, centroid_lon) <= 50.0
          |""".stripMargin)
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
      assert(plan.contains("__graft_cell"), plan)
      assert(q.count() > 0)
    }
  }

  test("strict < radius predicates are rewritten too, with identical rows") {
    def strict(s: SparkSession): DataFrame = {
      val dLat = col("latitude") - col("centroid_lat")
      val dLon = col("longitude") - col("centroid_lon")
      WeatherSynth.postalCodes(s, Sf)
        .crossJoin(WeatherSynth.stations(s, Sf))
        .filter(sqrt(dLat * dLat + dLon * dLon) * 111.0 < 50.0)
        .select(col("postal_code"), col("station_id"))
    }
    val expected = strict(spark).collect()
      .map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    withExtSession { s =>
      val plan = strict(s).queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") && plan.contains("__graft_cell"), plan)
      val got = strict(s).collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq
      assert(got === expected)
    }
  }

  test("non-radius cross joins are left untouched") {
    withExtSession { s =>
      val plan = WeatherSynth.postalCodes(s, Sf)
        .crossJoin(WeatherSynth.stations(s, Sf))
        .filter(col("latitude") + col("centroid_lat") > 104.0)
        .queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("CartesianProduct"), plan)
      assert(!plan.contains("__graft_cell"), plan)
    }
  }
}
