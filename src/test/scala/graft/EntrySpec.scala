package graft

class EntrySpec extends SparkSpec {

  test("entry() returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("all queries run and return rows at sf0.001") {
    val empty = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val n = fn(spark, Sf).count()
      if (n == 0) Some(name) else None
    }
    // a few queries are legitimately empty at sf0.001 (too little data for
    // their predicates) but return rows at the sf0.01 gate
    val mayBeEmpty = Set("q07_anti_join", "q27_weather_history",
      "q28_weather_temporal", "q31_weather_horizon", "q56_station_discovery")
    assert(empty.filterNot(mayBeEmpty).isEmpty, s"empty results: $empty")
  }
}
