package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Relational, TextOps}
import graft.weather.{WeatherPipeline, WeatherSynth}

/** Backs the broadcast→shuffle regime claim (`Conf.scala`, PLANS §sf1):
  * when every dimension outgrows the broadcast threshold — simulated with
  * `autoBroadcastJoinThreshold=-1` — the flagship equi-joins degrade to
  * SortMergeJoin/ShuffledHashJoin, never BroadcastNestedLoopJoin or a
  * cartesian product, with results identical to the broadcast regime.
  * This is the 100×-scale failure mode the reference would hit when a
  * "small" dimension (stations, suppliers) stops being small: a hard
  * `broadcast()` hint would force an executor-OOM build side, and a
  * non-equi fallback would go quadratic. Hints are therefore reserved for
  * dims bounded by construction (nation = 25 rows); everything else is
  * left to size stats + AQE, which this spec pins.
  */
class RegimeSpec extends SparkSpec {

  /** Run `q` in the default (broadcast-friendly) session and in a
    * no-broadcast session; assert identical rows and a shuffle-join plan
    * with no nested-loop/cartesian fallback.
    */
  private def checkRegime(name: String)(q: (SparkSession, String) => DataFrame): Unit = {
    val expected = q(spark, Sf).collect().map(_.toString).sorted.toSeq
    withCustomSession(_
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.ui.enabled", "false")) { s =>
      val df = q(s, Sf)
      val got = df.collect().map(_.toString).sorted.toSeq
      assert(got === expected, s"$name: results changed in the shuffle regime")
      // collect() above lets AQE settle, so this is the FINAL plan
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"$name went BNLJ:\n$plan")
      assert(!plan.contains("CartesianProduct"), s"$name went cartesian:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"$name: no shuffle join in\n$plan")
    }
  }

  test("q06 lineitem⋈supplier degrades to a shuffle join with identical results") {
    checkRegime("q06")(Relational.q06BroadcastJoin)
  }

  test("q35 4-table chain degrades to shuffle joins (nation stays hinted-broadcast)") {
    checkRegime("q35")(Relational.q35MultiJoin)
  }

  test("q86 incremental-dedup anti join degrades to a shuffle anti join") {
    checkRegime("q86")(TextOps.q86IncrementalDedup)
  }

  test("J2 grid-cell spatial join degrades to a shuffle join on `cell`") {
    checkRegime("grid") { (s, d) =>
      WeatherPipeline.spatialJoinGrid(
        WeatherSynth.stations(s, d), WeatherSynth.postalCodes(s, d))
    }
  }

  test("q89 LSH (t,bucket) candidate join degrades to a shuffle join") {
    // at a billion-row index neither side of the bucket join broadcasts —
    // the equi key must carry it to SMJ/SHJ, never a nested loop
    checkRegime("q89")(graft.operators.VectorOps.q89NeardupLsh)
  }
}
