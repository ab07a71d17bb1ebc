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

  test("grid-cell join plans as a hash equi-join, not BNLJ/cartesian") {
    val plan = WeatherPipeline.spatialJoinGrid(
      WeatherSynth.stations(spark, Sf), WeatherSynth.postalCodes(spark, Sf))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin"), plan)
  }
}
