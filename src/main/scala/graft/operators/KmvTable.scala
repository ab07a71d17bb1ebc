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
  *   - every maintenance writes a NEW generation dir (`gen-<n>/` with
  *     `sketches/` partitioned by (event_type, d) and `consumed/`),
  *     then commits it by creating `_COMMITTED` — a single atomic
  *     create. Readers resolve the highest committed generation, so a
  *     crash mid-write leaves an ignored partial dir and the PRIOR
  *     generation intact (the r9 self-overwrite — reading the table
  *     lazily from the very path being overwritten — is gone). The
  *     prior generation is retained after commit; older ones are
  *     swept.
  *   - an append touches only the appended days: untouched (type, day)
  *     partition dirs are COPIED byte-identical from the prior
  *     generation (KB-scale), only touched partitions are re-sketched
  *     and rewritten. Re-running after a crash re-merges the same
  *     files — KMV union-resketch is IDEMPOTENT (re-adding hashes
  *     already in the kept set changes nothing), so at-least-once
  *     maintenance is exactly-once in effect. No transaction log.
  *   - consumed-file membership is decided by ANTI-JOIN between the
  *     current listing and the consumed parquet — the consumed history
  *     is never collected to the driver; only the (append-scale) delta
  *     of new file names is.
  *
  * The table lives under `spark.graft.kmv.tableDir` (default: a
  * per-corpus tmp path). [[filesScanned]] / [[fullRebuilds]] are the
  * spec observables (KmvMaintainSpec): a no-op maintenance must scan
  * zero files; an append must scan only the appended files and rewrite
  * only the appended days' partitions; a mutation must rebuild.
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

  private val GenRe = "gen-(\\d+)".r

  /** Highest generation number with a `_COMMITTED` marker, if any. */
  private def latestCommitted(
      fs: org.apache.hadoop.fs.FileSystem, root: String): Option[Long] = {
    val rp = new org.apache.hadoop.fs.Path(root)
    if (!fs.exists(rp)) return None
    fs.listStatus(rp).toSeq.collect {
      case s if s.isDirectory => s.getPath.getName
    }.collect { case GenRe(n)
        if fs.exists(new org.apache.hadoop.fs.Path(s"$root/gen-$n/_COMMITTED")) =>
      n.toLong
    }.sorted.lastOption
  }

  /** Partitions this JVM's last maintenance REWROTE (vs copied forward
    * from the prior generation) — spec observable for the touched-days
    * posture. */
  private[graft] val lastRewrittenPartitions =
    new java.util.concurrent.atomic.AtomicReference[Set[String]](Set.empty)

  /** Bring the sketch table up to date with `dir`'s events feed and
    * return it: (event_type, d, ks sorted array<string> of ≤ k kept
    * hashes). Scans only unconsumed part files, rewrites only touched
    * (type, day) partitions into a fresh committed generation;
    * serialized per JVM (the table write is not concurrent-safe, and
    * callers are the gate/bench harnesses). */
  def maintain(spark: SparkSession, dir: String): DataFrame = synchronized {
    val root = tableRoot(spark, dir)
    val hconf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(hconf)
    val parts = listParts(spark, dir)
    import spark.implicits._
    val currentDf = parts.map(f => (f.name, f.len, f.mtime))
      .toDF("name", "len", "mtime")
    val curGen = latestCommitted(fs, root)
    val genPath = (n: Long) => s"$root/gen-$n"
    // mutation detector + delta, both by anti-join against the consumed
    // parquet: the consumed HISTORY never lands on the driver — only the
    // append-scale delta of new file names does
    val (stale, newParts) = curGen match {
      case None => (false, parts)
      case Some(g) =>
        val consumed = spark.read.parquet(s"${genPath(g)}/consumed")
        val mutated = consumed
          .join(currentDf, Seq("name", "len", "mtime"), "left_anti")
          .limit(1).count() > 0
        if (mutated) (true, parts)
        else {
          val newNames = currentDf
            .join(consumed, Seq("name", "len", "mtime"), "left_anti")
            .select(col("name")).as[String].collect().toSet
          (false, parts.filter(f => newNames(f.name)))
        }
    }
    if (stale) fullRebuilds.incrementAndGet()
    val base: Option[DataFrame] =
      if (curGen.isDefined && !stale)
        Some(spark.read.parquet(s"${genPath(curGen.get)}/sketches"))
      else None
    def ordered(df: DataFrame): DataFrame =
      df.select(col("event_type"), col("d"), col("ks"))
    if (newParts.isEmpty && base.isDefined) return ordered(base.get)
    filesScanned.addAndGet(newParts.size)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // cached: the touched-keys collect below and the generation write
    // both consume this aggregate — uncached, every appended file would
    // be scanned and re-sketched TWICE per maintenance. KB-scale kept
    // sets; released after the write.
    val newDaily = Tables.normalizeEventsTs(
        spark.read.parquet(newParts.map(_.path): _*))
      .filter(col("user_id").isNotNull)
      .select(col("event_type"), to_date(col("ts")).as("d"),
        md5(col("user_id").cast("string")).as("h"))
      .groupBy(col("event_type"), col("d"))
      .agg(graft.functions.KmvSketchAgg.kmvFull(spark, col("h"), K).as("ks"))
      .cache()
    // touched (type, day) keys of THIS append — bounded by the append
    // size (days × types), not the table; drives both the merge scope
    // and the untouched-partition copy below
    val touched: Set[(String, String)] = newDaily
      .select(col("event_type"), col("d").cast("string")).distinct()
      .as[(String, String)].collect().toSet
    val merged = base match {
      case None => newDaily
      case Some(b) =>
        // union-and-resketch over TOUCHED days only (two KB-sized kept
        // sets); untouched days never enter the plan
        val touchedKeys = touched.toSeq.toDF("event_type", "ds")
          .select(col("event_type"), col("ds").cast("date").as("d"))
        b.join(broadcast(touchedKeys), Seq("event_type", "d"), "left_semi")
          .select(col("event_type"), col("d"), explode(col("ks")).as("h"))
          .unionByName(newDaily.select(col("event_type"), col("d"),
            explode(col("ks")).as("h")))
          .groupBy(col("event_type"), col("d"))
          .agg(graft.functions.KmvSketchAgg.kmvFull(spark, col("h"), K).as("ks"))
    }
    // sweep uncommitted leftovers from a crashed run, then land the new
    // generation: touched partitions written, untouched partitions
    // COPIED byte-identical from the prior generation
    val nextN = curGen.getOrElse(-1L) + 1
    def sweepGens(pred: Long => Boolean): Unit = {
      val rp = new org.apache.hadoop.fs.Path(root)
      if (fs.exists(rp)) fs.listStatus(rp).toSeq.foreach { s =>
        s.getPath.getName match {
          case GenRe(n) if pred(n.toLong) => fs.delete(s.getPath, true)
          case _ => ()
        }
      }
    }
    sweepGens(_ >= nextN)
    val newSk = s"${genPath(nextN)}/sketches"
    merged.write.mode("overwrite").partitionBy("event_type", "d").parquet(newSk)
    newDaily.unpersist()
    // partition DIRECTORY names are Spark-escaped (space, '=', ':' …
    // become %XX) — the touched set must use the same escaping or a
    // rewritten partition of an escapable event_type would ALSO be
    // copied from the prior generation, nesting stale data inside the
    // fresh dir
    def esc(v: String): String =
      org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName(v)
    lastRewrittenPartitions.set(touched.map { case (t, d) =>
      s"event_type=${esc(t)}/d=${esc(d)}" })
    if (base.isDefined && !stale) {
      val prevSk = new org.apache.hadoop.fs.Path(
        s"${genPath(curGen.get)}/sketches")
      val touchedRel = lastRewrittenPartitions.get()
      for {
        et <- fs.listStatus(prevSk).toSeq
        if et.isDirectory && et.getPath.getName.startsWith("event_type=")
        dd <- fs.listStatus(et.getPath).toSeq
        if dd.isDirectory && dd.getPath.getName.startsWith("d=")
        rel = s"${et.getPath.getName}/${dd.getPath.getName}"
        if !touchedRel(rel)
      } org.apache.hadoop.fs.FileUtil.copy(fs, dd.getPath, fs,
        new org.apache.hadoop.fs.Path(s"$newSk/$rel"), false, hconf)
    }
    currentDf.coalesce(1).write.mode("overwrite")
      .parquet(s"${genPath(nextN)}/consumed")
    // the COMMIT: one atomic create — readers switch generations here
    fs.create(new org.apache.hadoop.fs.Path(
      s"${genPath(nextN)}/_COMMITTED"), false).close()
    // retain exactly one prior generation (in-flight lazy readers of the
    // previous table keep their files); sweep everything older
    sweepGens(_ + 1 < nextN)
    ordered(spark.read.parquet(newSk))
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
    if (!graft.operators.Layout.anchorsOn(spark)) {
      // production shape: the maintained table IS the answer — no
      // exact-anchor rescan of the feed (SketchAnchorsSpec pins that
      // this plan never touches events.parquet when the table is fresh)
      return t.withColumn("kmv_estimate",
          Layout.kmvEstimate(col("n_kept"), col("hk"), K, col("n_kept").cast("double")))
        .select(col("event_type"), col("d"), col("n_kept"), col("hk"),
          col("kmv_estimate"))
        .orderBy(col("event_type"), col("d"))
    }
    val exact = Tables.events(spark, dir)
      .filter(col("user_id").isNotNull)
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count_distinct(col("user_id")).as("n_distinct"))
    t.join(exact, Seq("event_type", "d"))
      .withColumn("kmv_estimate",
        Layout.kmvEstimate(col("n_kept"), col("hk"), K, col("n_distinct").cast("double")))
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
