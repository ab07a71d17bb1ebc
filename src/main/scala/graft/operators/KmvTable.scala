package graft.operators

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Durable, INCREMENTALLY-maintained daily sketch table — the profiler
  * shape the q139/q146/q148/q161 family's 100 TB posture keeps
  * promising: the raw feed is an append-only pile of part files; per
  * (event_type, day) the table stores BOTH bounded kept-sets the house
  * aggregates produce from one scan —
  *
  *   - `ks`  (array<string>): the KMV kept set over md5(user_id)
  *     (`kmvFull` storage form, distinct-count algebra — q146/q148/q151);
  *   - `smp` (array<struct<h,v>>): the bottom-k-by-md5(event_id) value
  *     sample (`QuantileSketch` storage form — rolling quantiles, q161).
  *
  * Both key on the same (event_type, d) partitions, so ONE maintenance
  * scan of a new part file feeds both families (r10 verdict #7) — a
  * 100 TB feed pays one scan per file EVER, and every downstream
  * question (daily distinct, rolling windows via q146's algebra,
  * pairwise overlap via q148's, rolling quantiles via q161's) runs off
  * the KB-sized table.
  *
  * Consistency contract:
  *   - file identity = (name, length, mtime). A consumed file that is
  *     no longer listed with the same identity means the corpus was
  *     MUTATED, not appended — the table is stale by construction and
  *     maintenance falls back to a full rebuild (the IVF corpus-stamp
  *     rule, `VectorOps.corpusStamp`, applied per-file so appends stay
  *     incremental).
  *   - every maintenance writes a NEW generation dir (`gen-<n>/`), then
  *     commits it by creating `_COMMITTED` — a single atomic create.
  *     Readers resolve the highest committed generation, so a crash
  *     mid-write leaves an ignored partial dir and the PRIOR generation
  *     intact.
  *   - MANIFEST generations (r10 verdict #2): a generation holds ONLY
  *     the partitions its maintenance actually rewrote, plus a
  *     `manifest` mapping every live (event_type, d) partition to the
  *     generation that OWNS its files. An append therefore WRITES only
  *     the touched partitions — the untouched table is carried forward
  *     by reference, not by the per-generation byte-copy that made
  *     append cost O(table width) driver IO (r10 measured the copy at
  *     no-op 0.5→1.7 s / append 2.1→7.0 s; this reverses it).
  *     Partition data files carry `event_type`/`d` as ORDINARY columns
  *     (the physical layout uses shadow partition columns `pet`/`pd`),
  *     so a reader lists the manifest and reads the owned dirs directly
  *     — no partition inference across generation roots.
  *   - generations are swept by REFERENCE: a gen dir is deleted only
  *     when neither the latest committed manifest nor the prior
  *     committed one references it (the prior manifest keeps in-flight
  *     lazy readers of the previous table alive — the one-prior
  *     retention rule, refcount form). Uncommitted leftovers of crashed
  *     runs are swept before the next write.
  *   - re-running after a crash re-merges the same files — KMV /
  *     bottom-k union-resketch is IDEMPOTENT (re-adding hashes already
  *     in a kept set changes nothing), so at-least-once maintenance is
  *     exactly-once in effect. No transaction log.
  *   - consumed-file membership is decided by ANTI-JOIN between the
  *     current listing and the consumed parquet — the consumed history
  *     is never collected to the driver; only the (append-scale) delta
  *     of new file names is.
  *   - a PRE-MANIFEST layout (r10's per-generation full copies, or the
  *     r9 flat `sketches/`+`consumed/` root) is detected by the missing
  *     manifest and migrated by one full rebuild; the stale dirs are
  *     deleted rather than lingering (r10 ADVICE).
  *
  * The table lives under `spark.graft.kmv.tableDir` (default: a
  * per-corpus tmp path). [[filesScanned]] / [[fullRebuilds]] are the
  * spec observables (KmvMaintainSpec): a no-op maintenance must scan
  * zero files; an append must scan only the appended files and WRITE
  * only the appended days' partitions; a mutation must rebuild.
  */
object KmvTable {

  private val K = 64

  /** Part files scanned by maintenance in this JVM (spec observable). */
  private[graft] val filesScanned = new AtomicLong
  /** Full rebuilds forced by corpus mutation (spec observable). */
  private[graft] val fullRebuilds = new AtomicLong

  /** Table schema as returned by [[maintain]] (and used for the empty
    * frame when a corpus has no rows yet — r10 ADVICE: an empty first
    * maintenance must not die on parquet schema inference). */
  private val tableSchema = StructType(Seq(
    StructField("event_type", StringType),
    StructField("d", DateType),
    StructField("ks", ArrayType(StringType, containsNull = false)),
    StructField("smp", ArrayType(StructType(Seq(
      StructField("h", StringType, nullable = false),
      StructField("v", LongType, nullable = false))), containsNull = false))))

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

  /** Partition-dir rel path in Spark's own escaping — the manifest key
    * and the physical layout must agree, and partition DIRECTORY names
    * are Spark-escaped (space, '=', ':' … become %XX): an unescaped
    * manifest key for an escapable event_type would orphan the written
    * partition (the r10 self-review lesson, manifest form). */
  private def relPath(eventType: String, day: String): String = {
    def esc(v: String): String =
      org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName(v)
    s"pet=${esc(eventType)}/pd=${esc(day)}"
  }

  /** The manifest: one line per live partition, `gen<TAB>relPath`.
    * Tiny (days × types lines) and written once per maintenance —
    * driver-side text IO at planner-metadata scale. */
  private def readManifest(
      fs: org.apache.hadoop.fs.FileSystem, root: String,
      gen: Long): Option[Map[String, Long]] = {
    val p = new org.apache.hadoop.fs.Path(s"$root/gen-$gen/manifest")
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    try {
      val txt = new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
      Some(txt.split("\n").iterator.filter(_.nonEmpty).map { line =>
        val i = line.indexOf('\t')
        line.substring(i + 1) -> line.substring(0, i).toLong
      }.toMap)
    } finally in.close()
  }

  private def writeManifest(
      fs: org.apache.hadoop.fs.FileSystem, root: String, gen: Long,
      manifest: Map[String, Long]): Unit = {
    val out = fs.create(
      new org.apache.hadoop.fs.Path(s"$root/gen-$gen/manifest"), false)
    try out.write(manifest.toSeq.sortBy(_._1)
      .map { case (rel, g) => s"$g\t$rel" }.mkString("\n").getBytes("UTF-8"))
    finally out.close()
  }

  /** Read the live table a committed manifest describes. The data files
    * carry event_type/d as ordinary columns, so a list of owned dirs
    * reads directly — no cross-generation partition discovery. */
  private def readTable(
      spark: SparkSession, root: String,
      manifest: Map[String, Long]): DataFrame =
    if (manifest.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], tableSchema)
    else {
      val dirs = manifest.toSeq.sortBy(_._1)
        .map { case (rel, g) => s"$root/gen-$g/parts/$rel" }
      spark.read.schema(tableSchema).parquet(dirs: _*)
        .select(col("event_type"), col("d"), col("ks"), col("smp"))
    }

  /** Partitions this JVM's last maintenance REWROTE (spec observable
    * for the touched-days posture; manifest-escaped rel paths). */
  private[graft] val lastRewrittenPartitions =
    new java.util.concurrent.atomic.AtomicReference[Set[String]](Set.empty)

  /** Bring the sketch table up to date with `dir`'s events feed and
    * return it: (event_type, d, ks, smp). Scans only unconsumed part
    * files, WRITES only touched (type, day) partitions into a fresh
    * committed generation (untouched partitions ride forward by
    * manifest reference); serialized per JVM (the table write is not
    * concurrent-safe, and callers are the gate/bench harnesses). */
  def maintain(spark: SparkSession, dir: String): DataFrame = synchronized {
    val root = tableRoot(spark, dir)
    val hconf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(hconf)
    val parts = listParts(spark, dir)
    import spark.implicits._
    val currentDf = parts.map(f => (f.name, f.len, f.mtime))
      .toDF("name", "len", "mtime")
    val committedGen = latestCommitted(fs, root)
    val genPath = (n: Long) => s"$root/gen-$n"
    // legacy layouts (r9 flat dirs, r10 manifest-less full-copy gens)
    // cannot be carried forward: their files lack the event_type/d data
    // columns this layout reads. One-shot migrate: drop everything and
    // rebuild fresh (r10 ADVICE — no stale dirs left lingering).
    val priorManifest = committedGen.flatMap(g => readManifest(fs, root, g))
    val legacy = committedGen.isDefined && priorManifest.isEmpty
    if (legacy) {
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      ()
    }
    Seq("sketches", "consumed").foreach { d => // r9 flat layout
      val p = new org.apache.hadoop.fs.Path(s"$root/$d")
      if (fs.exists(p)) { fs.delete(p, true); () }
    }
    val curGen = if (legacy) None else committedGen
    // mutation detector + append delta in ONE pass against the consumed
    // parquet (this is the no-op hot path — it runs on every
    // maintenance): full-outer on file identity, keep only the anomaly
    // rows. A consumed row with no current match means MUTATION; a
    // current row with no consumed match is the append delta. The
    // happy-path driver set is exactly the append delta; only a
    // mutated corpus (the full-rebuild path) surfaces its removed-file
    // names — the consumed HISTORY itself never lands on the driver.
    val (stale, newParts) = curGen match {
      case None => (false, parts)
      case Some(g) =>
        val consumed = spark.read.parquet(s"${genPath(g)}/consumed")
        val anomalies = consumed.withColumn("c", lit(1))
          .join(currentDf.withColumn("n", lit(1)),
            Seq("name", "len", "mtime"), "full_outer")
          .filter(col("c").isNull || col("n").isNull)
          .select(col("name"), col("c").isNull.as("isNew"))
          .as[(String, Boolean)].collect()
        if (anomalies.exists(!_._2)) (true, parts)
        else {
          val newNames = anomalies.iterator.map(_._1).toSet
          (false, parts.filter(f => newNames(f.name)))
        }
    }
    if (stale) fullRebuilds.incrementAndGet()
    val baseManifest: Map[String, Long] =
      if (curGen.isDefined && !stale) priorManifest.get else Map.empty
    val base: Option[DataFrame] =
      if (curGen.isDefined && !stale) Some(readTable(spark, root, baseManifest))
      else None
    if (newParts.isEmpty && base.isDefined) return base.get
    filesScanned.addAndGet(newParts.size)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // ONE scan of the new files feeds BOTH kept-set families: the KMV
    // distinct sketch over md5(user_id) and the quantile value sample
    // over md5(event_id) (both aggregates skip null inputs, so the
    // per-family filters ride in as null-guards). Cached: the
    // touched-keys collect and the generation write both consume this
    // aggregate. KB-scale kept sets; released after the write.
    val raw = Tables.normalizeEventsTs(
        spark.read.parquet(newParts.map(_.path): _*))
    val newDaily = raw
      .select(col("event_type"), to_date(col("ts")).as("d"),
        when(col("user_id").isNotNull,
          md5(col("user_id").cast("string"))).as("hu"),
        when(col("value").isNotNull,
          md5(col("event_id").cast("string"))).as("he"),
        when(col("value").isNotNull,
          (col("value").cast("decimal(18,2)") * lit(100)).cast("long")).as("v"))
      .groupBy(col("event_type"), col("d"))
      .agg(graft.functions.KmvSketchAgg.kmvFull(spark, col("hu"), K).as("ks"),
        graft.functions.QuantileSketchAgg.qsketch(
          spark, col("he"), col("v"), K).as("smp"))
      .cache()
    // touched (type, day) keys of THIS append — bounded by the append
    // size (days × types), not the table; drives the merge scope, the
    // partition write, and the manifest delta
    val touched: Set[(String, String)] = newDaily
      .select(col("event_type"), col("d").cast("string")).distinct()
      .as[(String, String)].collect().toSet
    val touchedRel = touched.map { case (t, d) => relPath(t, d) }
    val merged = base match {
      case None => newDaily
      case Some(_) =>
        // union-and-resketch over TOUCHED days only (KB-sized kept
        // sets): the prior table's touched partitions are resolved
        // STRAIGHT FROM THE MANIFEST, so the merge lists O(touched)
        // dirs — the read-side analogue of the touched-only write (the
        // earlier shape semi-joined against the full table, listing
        // every partition of every generation to discard all but the
        // appended days). ks and smp merge through their own
        // aggregates (explode/inline → re-sketch: the
        // bottom-k-of-union law holds for both), re-joined on the
        // touched key frame because a partition may have rows in one
        // family only — or neither.
        val touchedOwned = touchedRel.filter(baseManifest.contains).toSeq.sorted
        val bTouched =
          if (touchedOwned.isEmpty)
            spark.createDataFrame(
              spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], tableSchema)
          else spark.read.schema(tableSchema).parquet(touchedOwned.map(rel =>
              s"$root/gen-${baseManifest(rel)}/parts/$rel"): _*)
            .select(col("event_type"), col("d"), col("ks"), col("smp"))
        val pre = bTouched.unionByName(newDaily)
        val mergedKs = pre
          .select(col("event_type"), col("d"), explode(col("ks")).as("hu"))
          .groupBy(col("event_type"), col("d"))
          .agg(graft.functions.KmvSketchAgg.kmvFull(spark, col("hu"), K).as("ks"))
        val mergedSmp = pre
          .select(col("event_type"), col("d"), expr("inline(smp)"))
          .groupBy(col("event_type"), col("d"))
          .agg(graft.functions.QuantileSketchAgg.qsketch(
            spark, col("h"), col("v"), K).as("smp"))
        // anchor the merge on the full TOUCHED key set, not on the
        // aggregates: explode/inline ELIMINATE a group whose arrays are
        // both empty (a day whose only events carry null user AND null
        // value), but that partition is already promised to this
        // generation by the manifest — dropping the row here would
        // commit a manifest entry pointing at a dir that was never
        // written, wedging every later read (self-review r11)
        pre.select(col("event_type"), col("d")).distinct()
          .join(mergedKs, Seq("event_type", "d"), "left")
          .join(mergedSmp, Seq("event_type", "d"), "left")
          .select(col("event_type"), col("d"),
            coalesce(col("ks"), array().cast("array<string>")).as("ks"),
            coalesce(col("smp"),
              array().cast("array<struct<h:string,v:bigint>>")).as("smp"))
    }
    // sweep uncommitted leftovers from a crashed run, then land the new
    // generation: ONLY touched partitions written (shadow partition
    // columns pet/pd keep event_type/d as data columns in the files)
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
    lastRewrittenPartitions.set(touchedRel)
    if (touched.nonEmpty)
      merged
        .withColumn("pet", col("event_type"))
        .withColumn("pd", col("d").cast("string"))
        .write.mode("overwrite").partitionBy("pet", "pd")
        .parquet(s"${genPath(nextN)}/parts")
    newDaily.unpersist()
    // the new manifest: untouched partitions keep their owning
    // generation; touched ones are owned here. (A full rebuild has an
    // empty baseManifest, so the manifest is exactly the touched set.)
    val manifest = (baseManifest -- touchedRel) ++
      touchedRel.iterator.map(_ -> nextN)
    currentDf.coalesce(1).write.mode("overwrite")
      .parquet(s"${genPath(nextN)}/consumed")
    writeManifest(fs, root, nextN, manifest)
    // the COMMIT: one atomic create — readers switch generations here
    fs.create(new org.apache.hadoop.fs.Path(
      s"${genPath(nextN)}/_COMMITTED"), false).close()
    // sweep by REFERENCE: keep generations owning live partitions in
    // the new manifest or the PRIOR COMMITTED one (in-flight lazy
    // readers of the previous table), plus the two gen dirs
    // themselves. priorManifest, not baseManifest: on a stale rebuild
    // baseManifest is forced empty, but the last committed manifest's
    // references are exactly what an in-flight reader still needs
    // (self-review r11).
    val live = manifest.values.toSet ++
      (if (legacy) Set.empty[Long]
       else priorManifest.map(_.values.toSet).getOrElse(Set.empty[Long])) ++
      curGen.toSet + nextN
    sweepGens(n => !live.contains(n))
    readTable(spark, root, manifest)
  }

  /** The distinct-count view of the table — exactly the pre-r11
    * contract (event_type, d, ks), restricted to partitions with at
    * least one kept hash: the combined scan keeps a (type, day) row
    * whenever ANY event lands there, but the q146/q148/q151 algebra is
    * defined over days that have ≥1 non-null user (their oracles build
    * the daily table from a user_id IS NOT NULL frame). */
  def kmvView(spark: SparkSession, dir: String): DataFrame =
    maintain(spark, dir).filter(size(col("ks")) > 0)
      .select(col("event_type"), col("d"), col("ks"))

  /** The quantile-sample view (event_type, d, smp) — the durable form
    * of q161's daily sample table (r10 verdict #7), same restriction
    * for days with ≥1 non-null value. */
  def quantileView(spark: SparkSession, dir: String): DataFrame =
    maintain(spark, dir).filter(size(col("smp")) > 0)
      .select(col("event_type"), col("d"), col("smp"))

  /** q151 — the maintained table as an oracled query: per (type, day)
    * sketch columns + estimate, with exact anchors from the raw feed
    * (the corpus-scale pass the maintained table exists to avoid — the
    * gate's exactness hook, as in q139/q146/q148). The estimator and
    * saturation rule are q139's.
    */
  def q151KmvMaintain(spark: SparkSession, dir: String): DataFrame = {
    val t = kmvView(spark, dir)
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
