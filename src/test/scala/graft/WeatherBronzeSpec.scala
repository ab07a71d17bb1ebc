package graft

import org.apache.spark.sql.DataFrame
import graft.weather.{WeatherPipeline, WeatherQueries, WeatherSynth}

/** Proves the weather silver path really reads through the bronze landing
  * with reader-level pruning (the claims in WeatherQueries' scaladoc):
  *
  *  - the live observation-stage plan has the window's ts bound in
  *    `PushedFilters` (row-group stats) and `event_date` in
  *    `PartitionFilters` (directory pruning);
  *  - the forecast stage — whose own `date_trunc('day', ts)` predicate is
  *    not pushable — still gets both prunes from the bound stated at the
  *    read ([[graft.sources.Bronze.eventsWindowed]]);
  *  - the windowed bronze feed is row-identical to the raw nanos feed
  *    under the same cleaning, so q20–q22 hashes are unchanged.
  */
class WeatherBronzeSpec extends SparkSpec {

  private def bronzeObs: DataFrame =
    WeatherPipeline.cleanObservations(
      WeatherSynth.rawObservationsFrom(WeatherQueries.bronzeEventsWindowed(spark, Sf)))

  private def bronzeFc: DataFrame =
    WeatherPipeline.cleanForecasts(
      WeatherSynth.rawForecastsFrom(WeatherQueries.bronzeEventsWindowed(spark, Sf)))

  private def assertPruned(plan: String): Unit = {
    assert(plan.matches("(?s).*PushedFilters: \\[[^\\]]*GreaterThanOrEqual\\(ts[^\\]]*\\].*"), plan)
    assert(plan.matches("(?s).*PartitionFilters: \\[[^\\]]*event_date[^\\]]*\\].*"), plan)
  }

  test("observation silver plan pushes ts and prunes event_date partitions") {
    assertPruned(bronzeObs.queryExecution.executedPlan.toString)
  }

  test("forecast silver plan pushes ts despite the unpushable date_trunc filter") {
    assertPruned(bronzeFc.queryExecution.executedPlan.toString)
  }

  test("bronze-fed cleaning is row-identical to the raw nanos feed") {
    val rawObs = WeatherPipeline.cleanObservations(WeatherSynth.rawObservations(spark, Sf))
    val rawFc = WeatherPipeline.cleanForecasts(WeatherSynth.rawForecasts(spark, Sf))
    assert(bronzeObs.count() === rawObs.count())
    assert(bronzeObs.exceptAll(rawObs).isEmpty && rawObs.exceptAll(bronzeObs).isEmpty)
    assert(bronzeFc.count() === rawFc.count())
    assert(bronzeFc.exceptAll(rawFc).isEmpty && rawFc.exceptAll(bronzeFc).isEmpty)
  }
}
