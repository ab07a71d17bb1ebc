package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The `spark.sql.extensions` deployment path: a session built with
  * [[GraftExtensions]] exposes the custom functions to pure SQL, matching
  * the Column-API versions exactly.
  */
class ExtensionsSpec extends SparkSpec {

  test("injected functions resolve from pure SQL and match the Column API") {
    withExtSession { s =>
      val row = s.sql(
        """SELECT
          |  graft_dot_product(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS dp,
          |  graft_haversine_km(52.52, 13.405, 48.137, 11.575) AS berlin_munich_km,
          |  graft_grid_cell(52.52, 13.405, 0.5) AS cell
          |""".stripMargin).collect()(0)
      assert(row.getAs[Double]("dp") === 32.0)
      // Berlin-Munich great-circle is ~504 km
      assert(math.abs(row.getAs[Double]("berlin_munich_km") - 504.2) < 1.0)

      import s.implicits._
      val viaColumns = Seq((52.52, 13.405)).toDF("lat", "lon")
        .select(graft.functions.GeoFunctions.gridCell(col("lat"), col("lon"), 0.5).as("cell"))
        .collect()(0).getLong(0)
      assert(row.getAs[Long]("cell") === viaColumns)
    }
  }

  test("grid cell from SQL matches the grid join's cell for real station coords") {
    withExtSession { s =>
      val st = graft.weather.WeatherSynth.stations(s, Sf).limit(5)
      val viaSql = st.selectExpr("station_id", "graft_grid_cell(latitude, longitude, 0.5d) AS cell")
      val viaCol = st.select(col("station_id"),
        graft.functions.GeoFunctions.gridCell(col("latitude"), col("longitude"), 0.5).as("cell"))
      assert(viaSql.exceptAll(viaCol).count() === 0)
    }
  }
}
