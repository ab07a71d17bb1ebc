package graft

import org.apache.spark.sql.functions._
import graft.functions.{CircularMeanAggregator, GeoFunctions}
import graft.functions.CircularMeanAggregator.DirW

class AggregatorSpec extends SparkSpec {
  import spark.implicits._

  test("typed circular-mean Aggregator agrees with the expression combo") {
    val data = Seq.tabulate(200)(i => DirW((i * 37) % 360, 1.0 + (i % 5)))
    val typedRes = data.toDS().select(CircularMeanAggregator.agg.toColumn).head()
    val exprRes = data.toDF("dir", "weight")
      .agg(GeoFunctions.circularMeanDeg(col("dir"), col("weight")).as("m"))
      .select(GeoFunctions.normalizeDeg(col("m"))).head().getDouble(0)
    assert(math.abs(typedRes - exprRes) < 1e-9, s"typed=$typedRes expr=$exprRes")
  }

  test("north-straddling directions") {
    val res = Seq(DirW(350, 1.0), DirW(10, 1.0)).toDS()
      .select(CircularMeanAggregator.agg.toColumn).head()
    assert(res < 1e-9 || res > 360 - 1e-9, s"got $res")
  }
}
