package graft.weather

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{KmvTable, Layout, ZIndex, ZTable}
import graft.plans.ZoneMapFileIndex

/** The weather SERVE path riding the z-skipping layer: gold — the
  * table every API read hits — landed once per corpus as a durable
  * z-clustered layout by (postal_code, hour), and the serve queries
  * (q27 history, q24/q25 latest snapshots) reading it through a
  * [[graft.plans.ZoneMapFileIndex]] relation.
  *
  * This replaces the reference's OWN index surface on its OWN query
  * surface: `sql/schema.sql:278-305` B-tree-indexes gold on
  * (postal_code, timestamp) precisely so the history endpoint
  * (`weather.py:28-51`) can serve a (postal, time-window) predicate
  * without a table scan. Here the same predicate reaches
  * `ZoneMapFileIndex.listFiles` as pushed filters — equality on the
  * postal STRING zone, a range on the hour's timestamp zone — and
  * opens only the files whose exact footer bounds admit the pair
  * (WeatherZServeSpec pins files_opened ≪ files_total AND result
  * parity with the in-memory pipeline frames; the driver oracles
  * q24/q25/q27 against unchanged SQL — the results do not move, only
  * the scan does).
  *
  * The layout rides the full [[ZIndex]] maintenance contract
  * (generations, `_COMMITTED`, mutation → rebuild) over a
  * STAMP-ADDRESSED landing of gold ([[WeatherStats.dims]]'
  * discipline): a corpus regenerated in place lands fresh gold to a
  * new dir, and the layout's consumed-identity diff sees the swap as
  * a mutation and reclusters. At 100 TB gold is years × country of
  * hourly rows; the serve path opening ~1/nFiles of it per postal
  * query is the difference between an API and a batch job. */
object WeatherZServe {

  private lazy val goldRoot: String =
    java.nio.file.Files.createTempDirectory("graft_wx_gold_")
      .toAbsolutePath.toString

  /** Stamp-addressed land dirs already written in this JVM. */
  private val landed = scala.collection.mutable.Set.empty[String]

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Gold's full upstream identity: the weather feed plus both dim
    * sources (stations ← customer, postal ← nation). */
  private def sourceStamp(s: SparkSession, d: String): String =
    Seq("events.parquet", "customer.parquet", "nation.parquet")
      .map(t => KmvTable.stampOfPath(s, s"$d/$t"))
      .mkString("\n--\n")

  /** Land the unified gold (observations + forecasts — the reference's
    * single `weather_data_gold` table) once per (JVM, corpus stamp);
    * returns the landed parquet path. The write is one pass over the
    * already-memoized gold frames. */
  private def landedGold(s: SparkSession, d: String): String =
    landed.synchronized {
      val stamp = sourceStamp(s, d)
      val dir = s"$goldRoot/${md5hex(d).take(8)}/${md5hex(stamp).take(8)}"
      val path = s"$dir/gold.parquet"
      if (!landed(path)) {
        WeatherQueries.goldUnified(s, d)
          .write.mode("overwrite").parquet(path)
        landed += path
      }
      path
    }

  /** Gold's layout contract: cluster by the DERIVED pair (numeric
    * postal sort key, hour epoch) — the composite the reference
    * B-trees — while the zone map records the real postal_code /
    * timestamp / data_type columns for refutation. */
  private def goldZTable(s: SparkSession, d: String): ZTable = {
    val path = landedGold(s, d)
    ZTable("weather_gold",
      _ => path,
      (s2, _) => s2.read.parquet(path),
      "postal_code", "timestamp", // informational; clusterWith overrides
      nFiles = 32,
      clusterWith = Some((df, n) => Layout.clusterByZ(
        df.withColumn("__zx", col("postal_code").cast("long"))
          .withColumn("__zy", unix_timestamp(col("timestamp"))),
        "__zx", "__zy", n).drop("__zx", "__zy")))
  }

  /** The serve relation: unified gold behind the zone-mapped
    * FileIndex. Every predicate the serve queries push — postal
    * equality, time-window range, data_type equality — gets per-file
    * refutation from the planner. */
  private[graft] def zGoldWithIndex(s: SparkSession, d: String)
      : (DataFrame, ZoneMapFileIndex) =
    ZIndex.zFrame(s, d, goldZTable(s, d))

  def zGold(s: SparkSession, d: String): DataFrame =
    zGoldWithIndex(s, d)._1

  /** Bench prewarm: land gold + build the layout outside the serve
    * queries' timings (the priced-prewarm convention). */
  def prewarm(s: SparkSession, d: String): Unit = {
    ZIndex.ensure(s, d, goldZTable(s, d)); ()
  }
}
