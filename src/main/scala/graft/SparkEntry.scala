package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.operators.{Extras, IngestOps, Layout, Relational, TextOps, VectorOps}
import graft.weather.WeatherQueries
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship: the full weather bronze→silver→gold IDW pipeline at
    * sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    WeatherQueries.goldObservations(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ WeatherQueries.queries ++ TextOps.queries ++ VectorOps.queries ++ Extras.queries ++ IngestOps.queries ++ Layout.queries
  /** Queries whose cost is the micro-batch trigger/checkpoint protocol —
    * the bench's streaming lane, by explicit membership (all declared in
    * [[graft.operators.Extras.streamingQueries]], next to the map that
    * registers them). */
  def streamingQueries: Set[String] = Extras.streamingQueries
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracleSql ++ WeatherQueries.oracleSql ++ TextOps.oracleSql ++ VectorOps.oracleSql ++ Extras.oracleSql ++ IngestOps.oracleSql ++ Layout.oracleSql
}
