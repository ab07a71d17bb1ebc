package graft

import org.apache.spark.sql.functions._
import graft.weather.{WeatherPipeline, WeatherSynth}

/** Proves J2's grid-cell scale path: same rows as the nested-loop radius
  * join, but planned as an equi-join (no BNLJ / cartesian product).
  */
class GridJoinSpec extends SparkSpec {

  private def radiusJoinNL() = {
    val dLat = col("latitude") - col("centroid_lat")
    val dLon = col("longitude") - col("centroid_lon")
    WeatherSynth.postalCodes(spark, Sf)
      .crossJoin(broadcast(WeatherSynth.stations(spark, Sf)))
      .withColumn("distance_km", sqrt(dLat * dLat + dLon * dLon) * 111.0)
      .filter(col("distance_km") <= 50.0)
      .select(col("postal_code"), col("station_id"),
        WeatherPipeline.roundSafe(col("distance_km"), 2).as("distance_km"))
  }

  test("grid-cell equi-join returns exactly the nested-loop radius join's rows") {
    val grid = WeatherPipeline.spatialJoinGrid(
      WeatherSynth.stations(spark, Sf), WeatherSynth.postalCodes(spark, Sf))
    assert(grid.count() > 0)
    assert(grid.exceptAll(radiusJoinNL()).count() === 0)
    assert(radiusJoinNL().exceptAll(grid).count() === 0)
  }

  test("all grid-cell implementations pack identically") {
    // GeoFunctions.gridCell (Column API), RadiusJoinRewrite.packedCell
    // (raw Catalyst), GraftExtensions.graft_grid_cell (SQL injection) must
    // stay bit-identical — they are equi-join keys across module borders
    import org.apache.spark.sql.functions.{col, expr}
    val pts = WeatherSynth.stations(spark, Sf)
      .select(col("latitude").as("lat"), col("longitude").as("lon"))
    val viaColumn = pts.select(
      graft.functions.GeoFunctions.gridCell(col("lat"), col("lon"), 0.5).as("cell"))
    withExtSession { s =>
      val p2 = WeatherSynth.stations(s, Sf)
        .select(col("latitude").as("lat"), col("longitude").as("lon"))
      val viaSql = p2.selectExpr("graft_grid_cell(lat, lon, 0.5d) AS cell")
      assert(viaSql.exceptAll(viaColumn).count() === 0)
      assert(viaColumn.exceptAll(viaSql).count() === 0)
      // the optimizer rule's packing is exercised end-to-end by
      // RadiusRewriteSpec's bit-equality test; here we pin the two
      // user-facing builders against each other
    }
  }

  test("grid-cell join plans as a hash equi-join, not BNLJ/cartesian") {
    val plan = WeatherPipeline.spatialJoinGrid(
      WeatherSynth.stations(spark, Sf), WeatherSynth.postalCodes(spark, Sf))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin"), plan)
  }
}
