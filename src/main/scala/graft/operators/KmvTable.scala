package graft.operators

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Durable, INCREMENTALLY-maintained daily KMV sketch table — the
  * profiler shape the q139/q146/q148 family's 100 TB posture keeps
  * promising: the raw feed is an append-only pile of part files; per
  * (event_type, day) the table stores the full kept set (`kmvFull`
  * storage form), and maintenance scans ONLY part files it has not
  * consumed yet, merging their sketches into the table by
  * union-and-resketch (min-k of a union == min-k over the union of
  * kept sets). A 100 TB feed thus pays one scan per file EVER; every
  * downstream question (daily distinct, rolling windows via q146's
  * algebra, pairwise overlap via q148's) runs off the KB-sized table.
  *
  * Consistency contract:
  *   - file identity = (name, length, mtime). A consumed file that is
  *     no longer listed with the same identity means the corpus was
  *     MUTATED, not appended — the table is stale by construction and
  *     maintenance falls back to a full rebuild (the IVF corpus-stamp
  *     rule, `VectorOps.corpusStamp`, applied per-file so appends stay
  *     incremental).
  *   - writes land sketches first, consumed-list second. A crash
  *     between the two re-merges the same files on the next run — and
  *     KMV union-resketch is IDEMPOTENT (re-adding hashes already in
  *     the kept set changes nothing), so at-least-once maintenance is
  *     exactly-once in effect. No transaction log needed.
  *
  * The table lives under `spark.graft.kmv.tableDir` (default: a
  * per-corpus tmp path). [[filesScanned]] / [[fullRebuilds]] are the
  * spec observables (KmvMaintainSpec): a no-op maintenance must scan
  * zero files; an append must scan only the appended files; a mutation
  * must rebuild.
  */
object KmvTable {

  private val K = 64

  /** Part files scanned by maintenance in this JVM (spec observable). */
  private[graft] val filesScanned = new AtomicLong
  /** Full rebuilds forced by corpus mutation (spec observable). */
  private[graft] val fullRebuilds = new AtomicLong

  private def tableRoot(spark: SparkSession, dir: String): String =
    spark.conf.getOption("spark.graft.kmv.tableDir").getOrElse {
      val id = java.security.MessageDigest.getInstance("MD5")
        .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
      sys.props("java.io.tmpdir") + s"/graft_kmv_table/$id"
    }

  private case class PartFile(name: String, len: Long, mtime: Long, path: String)

  private def listParts(spark: SparkSession, dir: String): Seq[PartFile] = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/events.parquet")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val statuses =
      if (fs.getFileStatus(p).isFile) Array(fs.getFileStatus(p))
      else fs.listStatus(p).filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
    statuses.toSeq.map(s => PartFile(s.getPath.getName, s.getLen,
      s.getModificationTime, s.getPath.toString)).sortBy(_.name)
  }

  /** Bring the sketch table up to date with `dir`'s events feed and
    * return it: (event_type, d, ks sorted array<string> of ≤ k kept
    * hashes). Scans only unconsumed part files; serialized per JVM (the
    * table write is not concurrent-safe, and callers are the gate/bench
    * harnesses). */
  def maintain(spark: SparkSession, dir: String): DataFrame = synchronized {
    val root = tableRoot(spark, dir)
    val skPath = s"$root/sketches"
    val cPath = s"$root/consumed"
    val hp = new org.apache.hadoop.fs.Path(root)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = listParts(spark, dir)
    val haveTable = fs.exists(new org.apache.hadoop.fs.Path(s"$skPath/_SUCCESS")) &&
      fs.exists(new org.apache.hadoop.fs.Path(s"$cPath/_SUCCESS"))
    val consumed: Set[(String, Long, Long)] =
      if (haveTable)
        spark.read.parquet(cPath).collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      else Set.empty
    val currentIds = parts.map(f => (f.name, f.len, f.mtime)).toSet
    // mutation detector: every consumed identity must still be listed
    val stale = !consumed.subsetOf(currentIds)
    if (stale) fullRebuilds.incrementAndGet()
    val base: Option[DataFrame] =
      if (haveTable && !stale) Some(spark.read.parquet(skPath)) else None
    val newParts =
      if (base.isDefined) parts.filterNot(f => consumed((f.name, f.len, f.mtime)))
      else parts
    if (newParts.isEmpty && base.isDefined) return base.get
    filesScanned.addAndGet(newParts.size)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val newDaily = Tables.normalizeEventsTs(
        spark.read.parquet(newParts.map(_.path): _*))
      .filter(col("user_id").isNotNull)
      .select(col("event_type"), to_date(col("ts")).as("d"),
        md5(col("user_id").cast("string")).as("h"))
      .groupBy(col("event_type"), col("d"))
      .agg(graft.functions.KmvSketchAgg.kmvFull(spark, col("h"), K).as("ks"))
    val merged = base match {
      case None => newDaily
      case Some(b) =>
        // union-and-resketch over the two KB-sized frames' kept sets
        b.select(col("event_type"), col("d"), explode(col("ks")).as("h"))
          .unionByName(newDaily.select(col("event_type"), col("d"),
            explode(col("ks")).as("h")))
          .groupBy(col("event_type"), col("d"))
          .agg(graft.functions.KmvSketchAgg.kmvFull(spark, col("h"), K).as("ks"))
    }
    // sketches first, consumed second: see the idempotency note above
    merged.write.mode("overwrite").parquet(skPath)
    import spark.implicits._
    parts.map(f => (f.name, f.len, f.mtime)).toDF("name", "len", "mtime")
      .coalesce(1).write.mode("overwrite").parquet(cPath)
    spark.read.parquet(skPath)
  }

  /** q151 — the maintained table as an oracled query: per (type, day)
    * sketch columns + estimate, with exact anchors from the raw feed
    * (the corpus-scale pass the maintained table exists to avoid — the
    * gate's exactness hook, as in q139/q146/q148). The estimator and
    * saturation rule are q139's.
    */
  def q151KmvMaintain(spark: SparkSession, dir: String): DataFrame = {
    val t = maintain(spark, dir)
      .select(col("event_type"), col("d"),
        size(col("ks")).cast("long").as("n_kept"),
        element_at(col("ks"), size(col("ks"))).as("hk"))
    val exact = Tables.events(spark, dir)
      .filter(col("user_id").isNotNull)
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count_distinct(col("user_id")).as("n_distinct"))
    t.join(exact, Seq("event_type", "d"))
      .withColumn("kmv_estimate",
        when(col("n_kept") < K, col("n_distinct").cast("double"))
          .otherwise(lit((K - 1).toDouble) /
            (expr("GREATEST(CAST(conv(substring(hk, 1, 12), 16, 10) AS BIGINT), 1)").cast("double")
              / lit(281474976710656.0)))) // 16^12
      .select(col("event_type"), col("d"), col("n_kept"), col("hk"),
        col("n_distinct"), col("kmv_estimate"),
        ((col("kmv_estimate") - col("n_distinct").cast("double"))
          / col("n_distinct").cast("double")).as("rel_err"))
      .orderBy(col("event_type"), col("d"))
  }

  val q151Sql: String =
    """WITH e AS (
      |  SELECT event_type, CAST(ts AS DATE) AS d, user_id,
      |    md5(CAST(user_id AS VARCHAR)) AS h
      |  FROM events WHERE user_id IS NOT NULL),
      |dh AS (SELECT DISTINCT event_type, d, h FROM e),
      |r AS (
      |  SELECT event_type, d, h, ROW_NUMBER() OVER (
      |    PARTITION BY event_type, d ORDER BY h) AS rn
      |  FROM dh),
      |sk AS (
      |  SELECT event_type, d, COUNT(*) AS n_kept, MAX(h) AS hk
      |  FROM r WHERE rn <= 64 GROUP BY 1, 2),
      |x AS (
      |  SELECT event_type, d, COUNT(DISTINCT user_id) AS n_distinct
      |  FROM e GROUP BY 1, 2),
      |j AS (
      |  SELECT sk.event_type, sk.d, CAST(sk.n_kept AS BIGINT) AS n_kept,
      |    sk.hk, CAST(x.n_distinct AS BIGINT) AS n_distinct,
      |    CASE WHEN sk.n_kept < 64 THEN CAST(x.n_distinct AS DOUBLE)
      |      ELSE 63.0 /
      |        (CAST(GREATEST(CAST(CAST(('0x' || substring(sk.hk, 1, 12)) AS UBIGINT)
      |           AS BIGINT), 1) AS DOUBLE) / 281474976710656.0) END AS kmv_estimate
      |  FROM sk JOIN x ON sk.event_type = x.event_type AND sk.d = x.d)
      |SELECT event_type, d, n_kept, hk, n_distinct, kmv_estimate,
      |  (kmv_estimate - CAST(n_distinct AS DOUBLE))
      |    / CAST(n_distinct AS DOUBLE) AS rel_err
      |FROM j ORDER BY event_type, d""".stripMargin
}
