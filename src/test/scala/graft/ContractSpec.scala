package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants: every declared query is oracled (the
  * hash gate is the correctness story — a rows-only entry is a silent
  * downgrade), names are well-formed, and no oracle is orphaned.
  */
class ContractSpec extends AnyFunSuite {

  test("every query has an oracle and vice versa") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"orphaned oracles: ${(o -- q).toSeq.sorted}")
  }

  test("query names are unique across modules and well-formed") {
    import graft.operators.{Extras, IngestOps, Layout, Relational, TextOps, VectorOps}
    val maps = Seq(Relational.queries, graft.weather.WeatherQueries.queries,
      TextOps.queries, VectorOps.queries, Extras.queries, IngestOps.queries,
      Layout.queries)
    val total = maps.map(_.size).sum
    assert(SparkEntry.queries.size === total,
      "duplicate query name across modules (map union dropped an entry)")
    SparkEntry.queries.keys.foreach(k =>
      assert(k.matches("q\\d+_[a-z0-9_]+"), s"bad query name: $k"))
  }

  test("oracle SQL contains no Spark-only function names") {
    // functions DuckDB 1.x lacks (memory: determinism ruleset)
    val forbidden = Seq("get_json_object", "xxhash64(", "conv(", "pmod(",
      "date_trunc(\"", "regexp_count(")
    for ((name, sql) <- SparkEntry.oracleSql; f <- forbidden)
      assert(!sql.toLowerCase.contains(f), s"$name oracle uses $f")
  }
}
