package graft.weather

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.plans.{JoinSynopsis, SynopsisStats}

/** The FLAGSHIP pipeline as a consumer of the statistics catalog (r11
  * verdict #6): the gold build's J1 (staging ⋈ stations) and J2
  * (× postal centroids, radius-filtered) used to carry hand-placed
  * `broadcast()` hints — the builder telling the planner what to do.
  * Those hints are gone ([[WeatherPipeline.aggregateToPostal]]); the
  * dimension sides now come from CATALOG tables whose statistics are
  * injected from their synopses ([[JoinSynopsis.build]] →
  * [[SynopsisStats.inject]] — rowCount, key NDV/bounds, honest
  * sizeInBytes), and Spark's own threshold planning makes the
  * broadcast decision from those numbers (WeatherStatsSpec pins the
  * mechanism both directions: honest stats → broadcast with no hint
  * node anywhere; an inflated injected size → the same join plans
  * sort-merge, proving the decision input is the injected statistic,
  * not the file size).
  *
  * The dims are KB-scale (reference `sql/schema.sql:12-45` — stations
  * and postal polygons are small reference tables), so one tiny scan
  * at registration IS their ANALYZE; materialized once per (JVM,
  * corpus) under a per-JVM root (the bronze-landing convention —
  * re-landing under a shared root could delete files a concurrent
  * session's analyzed frames still reference). At 100 TB the fact side
  * grows; the dims stay dims — exactly the regime where a planner fed
  * honest dimension statistics keeps broadcasting no matter what the
  * fact's file sizes look like.
  */
object WeatherStats {

  private lazy val dimRoot: String =
    java.nio.file.Files.createTempDirectory("graft_wx_dims_")
      .toAbsolutePath.toString

  private val registered = scala.collection.mutable.Set.empty[String]

  private def id8(d: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(d.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)

  /** Catalog table names for a corpus dir (spec surface). */
  private[graft] def dimTableNames(d: String): (String, String) =
    (s"graft_wx_stations_${id8(d)}", s"graft_wx_postal_${id8(d)}")

  /** The stations + postal-centroid dims as catalog tables with
    * injected synopsis statistics; (re-)injection runs on every call —
    * KB-scale metadata, and the idempotent refresh keeps the stats
    * honest if a spec perturbed them. */
  def dims(s: SparkSession, d: String): (DataFrame, DataFrame) =
    registered.synchronized {
      val (stTbl, pcTbl) = dimTableNames(d)
      val root = s"$dimRoot/${id8(d)}"
      if (!registered(d)) {
        // the DATA write is once per JVM (overwriting under a shared
        // root could delete files a concurrent session's analyzed
        // frames still reference) ...
        WeatherSynth.stations(s, d).coalesce(1)
          .write.mode("overwrite").parquet(s"$root/stations")
        WeatherSynth.postalCodes(s, d).coalesce(1)
          .write.mode("overwrite").parquet(s"$root/postal")
        registered += d
      }
      // ... but the CATALOG entries are session-scoped state: a second
      // SparkSession in this JVM must still get its tables created
      // (IF NOT EXISTS keeps the common case a metadata no-op)
      s.sql(
        s"""CREATE TABLE IF NOT EXISTS $stTbl (
           |  station_id STRING, station_name STRING, latitude DOUBLE,
           |  longitude DOUBLE, altitude INT, source STRING)
           |USING parquet LOCATION '$root/stations'""".stripMargin)
      s.sql(
        s"""CREATE TABLE IF NOT EXISTS $pcTbl (
           |  postal_code STRING, city STRING,
           |  centroid_lat DOUBLE, centroid_lon DOUBLE)
           |USING parquet LOCATION '$root/postal'""".stripMargin)
      val synSt = JoinSynopsis.build(stTbl, s.table(stTbl), col("station_id"))
      SynopsisStats.inject(s, stTbl, synSt.rows,
        Map("station_id" -> synSt), avgRowBytes = 64)
      val synPc = JoinSynopsis.build(pcTbl, s.table(pcTbl), col("postal_code"))
      SynopsisStats.inject(s, pcTbl, synPc.rows,
        Map("postal_code" -> synPc), avgRowBytes = 48)
      (s.table(stTbl), s.table(pcTbl))
    }
}
