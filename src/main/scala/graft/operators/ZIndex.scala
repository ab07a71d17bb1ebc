package graft.operators

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** q172 — zone-map data skipping over a DURABLE z-clustered layout:
  * the scan-pruning consumer that closes the loop on q99's clustering
  * the way q169 closed it for the statistics catalog.
  *
  * q99 proved the layout property (tight per-bucket extents on BOTH
  * dimensions of the Morton code — the lake-side replacement for the
  * reference's composite B-tree indexes, `sql/schema.sql:295-305`);
  * this operator makes the skipping OPERATIONAL: [[ensure]] lands
  * lineitem physically clustered by z(l_partkey, l_orderkey)
  * ([[Layout.clusterByZ]] — range-partition + sort, 64 files) and
  * records an exact per-FILE zone map (min/max of both dimensions,
  * computed from the written files themselves — KB of metadata, the
  * same maintained-artifact discipline as the sketch table). A 2-D box
  * query then consults the zone map on the driver, reads ONLY the
  * overlapping files, and applies the residual predicate inside the
  * scan. Pruning is sound by construction — per-file bounds are exact
  * over the non-null population, and NULL keys cannot satisfy the box
  * predicate — regardless of how well clustered the files are;
  * clustering quality only decides HOW MANY files survive (ZIndexSpec
  * pins ~1/16 of the corpus for a 1%-of-z-space box; an i.i.d. layout
  * would read everything, which is exactly why the engine creates the
  * correlation it skips on).
  *
  * Maintenance follows the KmvTable contract: consumed-file identity,
  * generation dirs with atomic `_COMMITTED`, crash-leftover sweep,
  * one-prior retention for in-flight readers, mutation → full rebuild.
  * An APPEND clusters only the new feed files — among themselves, into
  * proportionally many files — and unions their zone-map rows with the
  * standing ones (the appended files carry their own exact bounds, so
  * skipping stays sound while clustering quality degrades gracefully).
  * When live generations exceed `spark.graft.zindex.maxGenerations`
  * (8), the append instead RECLUSTERS the full feed: a global sort
  * order cannot be compacted per-partition (the very property that
  * makes both dimensions' extents tight is global), so the periodic
  * rewrite is the production norm for clustered tables (Delta/Iceberg
  * `OPTIMIZE ZORDER` — amortized O(corpus / maxGenerations) per
  * append, and soundness never depended on it).
  *
  * At 100 TB: the zone map stays KB-per-thousand-files and lives on
  * the driver for exactly one filter pass; the pruned read opens only
  * the matching files — no listing, no footer reads, no tasks for the
  * rest of the corpus. That is the scan-side complement to the
  * statistics catalog's join planning.
  */
object ZIndex {

  /** Files written per full cluster (q99's 8×8 z-grid resolution). */
  private[graft] val NFiles = 64

  /** Spec observables. */
  private[graft] val zBuilds = new AtomicLong // full (re)clusters
  private[graft] val zAppends = new AtomicLong // incremental appends
  private[graft] val zFilesTotal = new AtomicLong // zone-map rows at last query
  private[graft] val zFilesRead = new AtomicLong // files surviving the prune
  /** Feed part files read by maintenance in this JVM (the KmvTable
    * convention: an append must scan exactly the appended files). */
  private[graft] val zFeedFilesScanned = new AtomicLong

  /** (root → (feed stamp, committed gen)) — a repeat [[ensure]] on an
    * unchanged corpus pays one feed listStatus. */
  private val memo =
    new java.util.concurrent.ConcurrentHashMap[String, (String, Long)]()
  def clearMemo(): Unit = { memo.clear(); entryMemo.clear() }

  private val rootLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def root(spark: SparkSession, dir: String): String =
    spark.conf.getOption("spark.graft.zindex.dir")
      .getOrElse(sys.props("java.io.tmpdir") + s"/graft_zindex/${md5hex(dir)}")

  // file-identity listing shared with every derived artifact
  // ([[KmvTable.partsOf]] — one implementation of the stamp discipline)
  private def listFeed(spark: SparkSession, dir: String): Seq[KmvTable.PartFile] =
    KmvTable.partsOf(spark, s"$dir/lineitem.parquet")

  private def stampOf(feed: Seq[KmvTable.PartFile]): String =
    feed.map(f => s"${f.name}\t${f.len}\t${f.mtime}").mkString("\n")

  /** Cluster `rows` into `n` z-sorted files under `genDir/files` and
    * return the zone-map rows (gen-relative file path + exact per-file
    * bounds + row count) read FROM THE PARQUET FOOTERS of the written
    * files — parquet already wrote exact per-row-group min/max for
    * these INT64 columns, so the zone map costs n footer reads (KB
    * each), never a second pass over the data. Conservative semantics
    * when a footer carries no usable statistics for a column: the
    * bounds widen to (Long.Min, Long.Max) so the file is ALWAYS kept —
    * pruning soundness never rests on statistics being present. A
    * column that is all-null in a file yields null bounds (the file
    * cannot satisfy a predicate on it). */
  private def clusterAndMap(spark: SparkSession, rows: DataFrame,
      genName: String, genDir: String, n: Int): DataFrame = {
    Layout.clusterByZ(rows, "l_partkey", "l_orderkey", n)
      .write.mode("overwrite").parquet(s"$genDir/files")
    val conf = spark.sparkContext.hadoopConfiguration
    val fdir = new org.apache.hadoop.fs.Path(s"$genDir/files")
    val files = fdir.getFileSystem(conf).listStatus(fdir)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .sortBy(_.getPath.getName)
    import scala.jdk.CollectionConverters._
    val mapRows = files.toSeq.map { st =>
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(st, conf))
      val blocks = try reader.getFooter.getBlocks.asScala.toSeq
        finally reader.close()
      val np = blocks.map(_.getRowCount).sum
      // per-column fold over row-group statistics:
      //   None                  → no usable stats → (Min, Max) keep-all
      //   Some(None)            → all row groups all-null → null bounds
      //   Some(Some((lo, hi)))  → exact bounds
      def bounds(colName: String): Option[Option[(Long, Long)]] = {
        val perBlock = blocks.map { b =>
          b.getColumns.asScala.find(
            _.getPath.toDotString == colName) match {
            case None => None // column absent from the file: no stats
            case Some(c) =>
              val s = c.getStatistics
              if (s == null || s.isEmpty) None // stats not written
              else if (!s.hasNonNullValue && s.getNumNulls > 0)
                Some(None) // row group is all-null for this column
              else if (!s.hasNonNullValue) None // empty/unknown: keep
              else Some(Some((
                s.genericGetMin.asInstanceOf[java.lang.Long].longValue,
                s.genericGetMax.asInstanceOf[java.lang.Long].longValue)))
          }
        }
        if (perBlock.exists(_.isEmpty)) None // any unknown poisons to keep-all
        else {
          val defined = perBlock.flatten.flatten
          if (defined.isEmpty) Some(None)
          else Some(Some((defined.map(_._1).min, defined.map(_._2).max)))
        }
      }
      def cols(b: Option[Option[(Long, Long)]]): (Option[Long], Option[Long]) =
        b match {
          case None => (Some(Long.MinValue), Some(Long.MaxValue))
          case Some(None) => (None, None)
          case Some(Some((lo, hi))) => (Some(lo), Some(hi))
        }
      val (pmin, pmax) = cols(bounds("l_partkey"))
      val (omin, omax) = cols(bounds("l_orderkey"))
      (s"$genName/files/${st.getPath.getName}", np, pmin, pmax, omin, omax)
    }
    import spark.implicits._
    mapRows.toDF("file", "np", "pmin", "pmax", "omin", "omax")
  }

  private val GenRe = "gen-(\\d+)".r

  /** Land-or-refresh the clustered layout; returns (root, committed
    * gen). One feed listStatus on the memo-hit path. */
  def ensure(spark: SparkSession, dir: String): (String, Long) = {
    val r = root(spark, dir)
    rootLocks.computeIfAbsent(r, _ => new Object).synchronized {
      val feed = listFeed(spark, dir)
      val stamp = stampOf(feed)
      val rp = new org.apache.hadoop.fs.Path(r)
      val fs = rp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      Option(memo.get(r)) match {
        // one existence probe alongside the stamp: an externally wiped
        // layout (tmp cleaner) must fall through to a rebuild, not
        // serve dead paths off the memo
        case Some((s, g)) if s == stamp && fs.exists(
            new org.apache.hadoop.fs.Path(s"$r/gen-$g/_COMMITTED")) =>
          return (r, g)
        case _ => ()
      }
      val gens: Seq[Long] =
        if (!fs.exists(rp)) Seq.empty
        else fs.listStatus(rp).toSeq.collect {
          case s if s.isDirectory => s.getPath.getName
        }.collect { case GenRe(n) => n.toLong }.sorted
      val committed = gens.filter(g =>
        fs.exists(new org.apache.hadoop.fs.Path(s"$r/gen-$g/_COMMITTED")))
      // crash-leftover sweep: uncommitted gens above the high-water mark
      (gens.toSet -- committed.toSet).foreach(g =>
        fs.delete(new org.apache.hadoop.fs.Path(s"$r/gen-$g"), true))
      val latest = committed.lastOption
      val nextN = committed.lastOption.map(_ + 1).getOrElse(0L)
      val genDir = s"$r/gen-$nextN"
      val genName = s"gen-$nextN"

      // consumed-identity diff (the KmvTable mutation detector): a
      // consumed line that vanished from the feed means MUTATION; the
      // surplus current lines are the append delta
      val consumedLines: Set[String] = latest.map { g =>
        spark.read.textFile(s"$r/gen-$g/consumed").collect().toSet
      }.getOrElse(Set.empty)
      val currentLines = feed.map(f => s"${f.name}\t${f.len}\t${f.mtime}").toSet
      val mutated = latest.isDefined && !consumedLines.subsetOf(currentLines)
      val newFeed = feed.filter(f =>
        !consumedLines.contains(s"${f.name}\t${f.len}\t${f.mtime}"))

      if (latest.isDefined && !mutated && newFeed.isEmpty) {
        memo.put(r, (stamp, latest.get))
        return (r, latest.get)
      }

      val priorMap: Option[DataFrame] = latest.map(g =>
        spark.read.parquet(s"$r/gen-$g/zonemap"))
      val maxGens = spark.conf.getOption("spark.graft.zindex.maxGenerations")
        .flatMap(v => scala.util.Try(v.trim.toInt).toOption)
        .filter(_ >= 1).getOrElse(8)
      val liveGens: Set[Long] = priorMap.map(_.select(col("file"))
        .as(org.apache.spark.sql.Encoders.STRING).collect()
        .map(f => f.split("/")(0)).collect { case GenRe(n) => n.toLong }
        .toSet).getOrElse(Set.empty)

      val full = latest.isEmpty || mutated || liveGens.size + 1 > maxGens
      val zonemap: DataFrame =
        if (full) {
          // initial build, mutation rebuild, or the periodic global
          // recluster that bounds generation sprawl AND restores
          // clustering quality (see object doc)
          zBuilds.incrementAndGet()
          zFeedFilesScanned.addAndGet(feed.size)
          clusterAndMap(spark, Tables.lineitem(spark, dir), genName, genDir,
            NFiles)
        } else {
          zAppends.incrementAndGet()
          zFeedFilesScanned.addAndGet(newFeed.size)
          val newRows = spark.read.parquet(newFeed.map(_.path): _*)
            .select(Tables.lineitem(spark, dir).columns.map(col): _*)
            .cache()
          try {
            // proportionally many files for the delta (≥1): appended
            // files z-cluster among themselves, so their zone-map rows
            // are as tight as the delta allows
            val baseRows = priorMap.get.agg(sum(col("np")))
              .collect()(0).getLong(0)
            val k = math.max(1L, math.min(NFiles.toLong,
              math.round(NFiles.toDouble * newRows.count() /
                math.max(1L, baseRows)))).toInt
            clusterAndMap(spark, newRows, genName, genDir, k)
              .unionByName(priorMap.get)
          } finally { newRows.unpersist(); () }
        }
      zonemap.coalesce(1).write.mode("overwrite").parquet(s"$genDir/zonemap")
      spark.createDataset(feed.map(f => s"${f.name}\t${f.len}\t${f.mtime}"))(
        org.apache.spark.sql.Encoders.STRING)
        .coalesce(1).write.mode("overwrite").text(s"$genDir/consumed")
      fs.create(new org.apache.hadoop.fs.Path(s"$genDir/_COMMITTED"), false)
        .close()
      // one-prior retention: gens referenced by the NEW or the PRIOR
      // committed zone map (plus the prior gen itself — it holds the
      // zone map an in-flight reader may have collected but not yet
      // opened data files through) survive; everything else is
      // reclaimed. The new map's gens are always ⊆ liveGens + nextN.
      val newLive: Set[Long] = liveGens ++ latest.toSet + nextN
      committed.filterNot(newLive.contains).foreach(g =>
        fs.delete(new org.apache.hadoop.fs.Path(s"$r/gen-$g"), true))
      memo.put(r, (stamp, nextN))
      (r, nextN)
    }
  }

  /** The 2-D query box, derived from the zone map's own global bounds
    * (exact: min-of-file-mins == the table min over the non-null
    * population) — decile 2 of BOTH ranges, ~1% of the z-space. The
    * SAME decile on both dimensions deliberately: replicated corpora
    * (ScaleUp offsets every key family per copy) correlate the two
    * keys along the diagonal, so an off-diagonal box would be empty at
    * replica scale while a diagonal one is populated at every scale —
    * and a correlated key space is precisely where z-clustering
    * prunes hardest. Long division truncates toward zero on the
    * non-negative ranges here, exactly DuckDB's `//`. */
  private[graft] def box(plo: Long, phi: Long, olo: Long, ohi: Long)
      : (Long, Long, Long, Long) =
    (plo + (phi - plo) / 10, plo + (phi - plo) * 2 / 10,
      olo + (ohi - olo) / 10, olo + (ohi - olo) * 2 / 10)

  /** q172 — the box aggregate over the pruned scan: consult the zone
    * map (KB, driver), open ONLY the overlapping files, apply the
    * residual predicate inside the scan.
    *
    * Measurement arms (`spark.graft.zindex.mode`): `pruned` (default)
    * consults the zone map; `all` opens every layout file (the
    * file-skipping delta in isolation — small on a local SSD, where
    * the z-sorted files' tight row-group stats let parquet skip
    * almost everything from the footers anyway; at object-store scale
    * the never-opened files are the win); `raw` computes the identical
    * result straight off the UNCLUSTERED corpus table — the cost a
    * user without the layout pays: random row order means wide
    * row-group bounds, so pushdown cannot skip and the scan reads the
    * whole table. The `raw` arm derives the box from the table's own
    * bounds (one min/max pass), exactly the oracle's arithmetic. */
  def q172ZorderPrune(spark: SparkSession, dir: String): DataFrame = {
    val mode = spark.conf.getOption("spark.graft.zindex.mode")
      .getOrElse(if (!spark.conf.getOption("spark.graft.zindex.prune")
        .contains("false")) "pruned" else "all")
    if (mode == "raw") return q172Raw(spark, dir)
    val (r, gen) = ensure(spark, dir)
    val zm = spark.read.parquet(s"$r/gen-$gen/zonemap").collect()
    zFilesTotal.set(zm.length)
    require(zm.nonEmpty, "zone map of a non-empty table cannot be empty")
    def lmin(c: String): Long = zm.iterator.filter(!_.isNullAt(
      zm.head.fieldIndex(c))).map(_.getAs[Long](c)).min
    def lmax(c: String): Long = zm.iterator.filter(!_.isNullAt(
      zm.head.fieldIndex(c))).map(_.getAs[Long](c)).max
    val (xlo, xhi, ylo, yhi) =
      box(lmin("pmin"), lmax("pmax"), lmin("omin"), lmax("omax"))
    val prune = mode == "pruned"
    val keep = zm.filter { row =>
      def l(c: String): Option[Long] =
        if (row.isNullAt(row.fieldIndex(c))) None else Some(row.getAs[Long](c))
      // a file whose bounds are null on either dimension holds no row
      // that can satisfy the box predicate (NULL keys compare false)
      !prune || (for { pmin <- l("pmin"); pmax <- l("pmax")
             omin <- l("omin"); omax <- l("omax") }
        yield pmin < xhi && pmax >= xlo && omin < yhi && omax >= ylo)
        .getOrElse(false)
    }.map(row => s"$r/${row.getAs[String]("file")}")
    zFilesRead.set(keep.length)
    // attribution line (the RunOne/Bench stderr convention): wall-time
    // parity between pruned and all on a warm local disk is expected —
    // THIS is the number that scales
    System.err.println(s"[zindex] mode=$mode files_read=${keep.length} " +
      s"files_total=${zm.length}")
    val boxed =
      if (keep.isEmpty)
        // schema-faithful empty frame: one footer, zero row groups read
        spark.read.parquet(s"$r/${zm.head.getAs[String]("file")}")
          .filter(lit(false))
      else spark.read.parquet(keep.toIndexedSeq: _*)
    boxed
      .filter(col("l_partkey") >= xlo && col("l_partkey") < xhi &&
        col("l_orderkey") >= ylo && col("l_orderkey") < yhi)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
          .as("sum_qty"),
        countDistinct(col("l_suppkey")).as("n_supp"))
      .orderBy(col("l_returnflag"))
  }

  /** The `raw` measurement arm: the oracle's computation verbatim on
    * the unclustered corpus table — bounds pass + filtered scan, no
    * layout, no zone map (see [[q172ZorderPrune]]). */
  private def q172Raw(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val b = li.agg(min(col("l_partkey")), max(col("l_partkey")),
      min(col("l_orderkey")), max(col("l_orderkey"))).collect()(0)
    val (xlo, xhi, ylo, yhi) =
      box(b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
    System.err.println(s"[zindex] mode=raw (unclustered scan)")
    li.filter(col("l_partkey") >= xlo && col("l_partkey") < xhi &&
        col("l_orderkey") >= ylo && col("l_orderkey") < yhi)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
          .as("sum_qty"),
        countDistinct(col("l_suppkey")).as("n_supp"))
      .orderBy(col("l_returnflag"))
  }

  /** q174's one-dimensional range — decile 3 of the ORDERKEY range,
    * no partkey predicate at all. */
  private[graft] def band(olo: Long, ohi: Long): (Long, Long) =
    (olo + (ohi - olo) * 2 / 10, olo + (ohi - olo) * 3 / 10)

  /** q174 — the NON-LEADING-column range query over the SAME
    * z-clustered layout ([[q172ZorderPrune]]'s artifact, shared
    * build): a predicate on l_orderkey alone, no l_partkey term.
    *
    * This is the claim that justifies z-order over a plain sort: the
    * reference's composite B-tree `(partkey, orderkey)`
    * (`sql/schema.sql:295-305`) serves only LEADING-prefix predicates
    * — an orderkey-only range scans the whole index — and a layout
    * sorted by partkey alone is exactly as blind. The Morton
    * interleave keeps BOTH columns' per-file extents tight, so the
    * same 64-file layout serves the orderkey-only band by opening the
    * ~1-strip of files whose [omin, omax] overlap it (ZIndexSpec pins
    * the strict subset; a 10% band keeps ~⅛–¼ of the grid vs ~1/64
    * for q172's 2-D cell — the classic z-order strip-vs-cell
    * geometry). Same `raw` arm convention for the no-layout baseline. */
  def q174ZorderOnedim(spark: SparkSession, dir: String): DataFrame = {
    val mode = spark.conf.getOption("spark.graft.zindex.mode")
      .getOrElse("pruned")
    if (mode == "raw") {
      val li = Tables.lineitem(spark, dir)
      val b = li.agg(min(col("l_orderkey")), max(col("l_orderkey"))).collect()(0)
      val (ylo, yhi) = band(b.getLong(0), b.getLong(1))
      System.err.println(s"[zindex] q174 mode=raw (unclustered scan)")
      return bandAgg(li, ylo, yhi)
    }
    val (r, gen) = ensure(spark, dir)
    val zm = spark.read.parquet(s"$r/gen-$gen/zonemap").collect()
    zFilesTotal.set(zm.length)
    require(zm.nonEmpty, "zone map of a non-empty table cannot be empty")
    def lmin(c: String): Long = zm.iterator.filter(!_.isNullAt(
      zm.head.fieldIndex(c))).map(_.getAs[Long](c)).min
    def lmax(c: String): Long = zm.iterator.filter(!_.isNullAt(
      zm.head.fieldIndex(c))).map(_.getAs[Long](c)).max
    val (ylo, yhi) = band(lmin("omin"), lmax("omax"))
    val prune = mode == "pruned"
    val keep = zm.filter { row =>
      def l(c: String): Option[Long] =
        if (row.isNullAt(row.fieldIndex(c))) None else Some(row.getAs[Long](c))
      !prune || (for { omin <- l("omin"); omax <- l("omax") }
        yield omin < yhi && omax >= ylo).getOrElse(false)
    }.map(row => s"$r/${row.getAs[String]("file")}")
    zFilesRead.set(keep.length)
    System.err.println(s"[zindex] q174 mode=$mode files_read=${keep.length} " +
      s"files_total=${zm.length}")
    val banded =
      if (keep.isEmpty)
        spark.read.parquet(s"$r/${zm.head.getAs[String]("file")}")
          .filter(lit(false))
      else spark.read.parquet(keep.toIndexedSeq: _*)
    bandAgg(banded, ylo, yhi)
  }

  private def bandAgg(df: DataFrame, ylo: Long, yhi: Long): DataFrame =
    df.filter(col("l_orderkey") >= ylo && col("l_orderkey") < yhi)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
          .as("sum_qty"),
        countDistinct(col("l_suppkey")).as("n_supp"))
      .orderBy(col("l_returnflag"))

  /** q175 — the zone map inside SPARK'S OWN scan planning: the same
    * box aggregate as q172, but expressed as ordinary DataFrame
    * filters over a relation backed by
    * [[graft.plans.ZoneMapFileIndex]]. Nothing query-specific consults
    * the map: Spark pushes the data filters to the FileIndex and the
    * index refutes them per file against the exact bounds — the
    * driver-side q172 method generalized to EVERY predicate a user
    * writes over the relation (the Delta-style integration). The
    * filters are deliberately spelled in BOTH literal orientations
    * (col ⊗ lit and lit ⊗ col) to exercise the index's normalization.
    * Oracle: [[q172Sql]] — identical semantics, different plumbing. */
  /** The z-layout as an UNFILTERED relation over
    * [[graft.plans.ZoneMapFileIndex]], plus its zone entries — the
    * spec surface for planner-side pruning with arbitrary predicates. */
  /** (root, gen) → zone entries with resolved FileStatus. A committed
    * generation's CONTENT is immutable (maintenance only ever writes
    * new generations), so the memo never goes stale — it retires the
    * ~(files + 1) metadata RPCs a per-call rebuild would pay. */
  private val entryMemo = new java.util.concurrent.ConcurrentHashMap[
    (String, Long), IndexedSeq[graft.plans.ZoneEntry]]()

  /** Resolve the latest committed generation's zone entries (memoized
    * per immutable (root, gen) — see [[entryMemo]]). */
  private def resolveEntries(spark: SparkSession, dir: String)
      : IndexedSeq[graft.plans.ZoneEntry] = {
    val (r, gen) = ensure(spark, dir)
    val conf = spark.sparkContext.hadoopConfiguration
    entryMemo.computeIfAbsent((r, gen), _ => {
      val zm = spark.read.parquet(s"$r/gen-$gen/zonemap").collect()
      require(zm.nonEmpty, "zone map of a non-empty table cannot be empty")
      zm.map { row =>
        def l(c: String): Option[Long] =
          if (row.isNullAt(row.fieldIndex(c))) None else Some(row.getAs[Long](c))
        val p = new org.apache.hadoop.fs.Path(s"$r/${row.getAs[String]("file")}")
        graft.plans.ZoneEntry(p.getFileSystem(conf).getFileStatus(p),
          l("pmin"), l("pmax"), l("omin"), l("omax"))
      }.toIndexedSeq
    })
  }

  private[graft] def zFrame(spark: SparkSession, dir: String)
      : (DataFrame, graft.plans.ZoneMapFileIndex) = {
    val r = root(spark, dir)
    val index = new graft.plans.ZoneMapFileIndex(
      new org.apache.hadoop.fs.Path(r),
      () => resolveEntries(spark, dir))
    val entries = index.currentEntries
    val schema = spark.read.parquet(entries.head.status.getPath.toString).schema
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val rel = org.apache.spark.sql.execution.datasources.HadoopFsRelation(
      index, new org.apache.spark.sql.types.StructType(), schema, None,
      new org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat,
      Map.empty[String, String])(cs)
    (cs.baseRelationToDataFrame(rel), index)
  }

  def q175ZorderFileIndex(spark: SparkSession, dir: String): DataFrame = {
    val (df, index) = zFrame(spark, dir)
    val entries = index.currentEntries
    // keep-all sentinel bounds (stats unavailable at map-build time)
    // must not poison the global range the box derives from
    def gmin(f: graft.plans.ZoneEntry => Option[Long]): Long =
      entries.flatMap(f(_)).filter(_ != Long.MinValue).min
    def gmax(f: graft.plans.ZoneEntry => Option[Long]): Long =
      entries.flatMap(f(_)).filter(_ != Long.MaxValue).max
    val (xlo, xhi, ylo, yhi) =
      box(gmin(_.pmin), gmax(_.pmax), gmin(_.omin), gmax(_.omax))
    df
      .filter(col("l_partkey") >= xlo && lit(xhi) > col("l_partkey") &&
        col("l_orderkey") >= ylo && lit(yhi) > col("l_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
          .as("sum_qty"),
        countDistinct(col("l_suppkey")).as("n_supp"))
      .orderBy(col("l_returnflag"))
  }

  /** DuckDB oracle for [[q174ZorderOnedim]]. */
  val q174Sql: String =
    """WITH b AS (
      |  SELECT MIN(l_orderkey) AS olo, MAX(l_orderkey) AS ohi
      |  FROM lineitem),
      |x AS (
      |  SELECT olo + (ohi - olo) * 2 // 10 AS ylo,
      |         olo + (ohi - olo) * 3 // 10 AS yhi
      |  FROM b)
      |SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supp
      |FROM lineitem, x
      |WHERE l_orderkey >= ylo AND l_orderkey < yhi
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** DuckDB oracle: identical box arithmetic (`//` floor division ==
    * Long truncation on these non-negative ranges) straight off the
    * raw table. */
  val q172Sql: String =
    """WITH b AS (
      |  SELECT MIN(l_partkey) AS plo, MAX(l_partkey) AS phi,
      |         MIN(l_orderkey) AS olo, MAX(l_orderkey) AS ohi
      |  FROM lineitem),
      |x AS (
      |  SELECT plo + (phi - plo) // 10 AS xlo,
      |         plo + (phi - plo) * 2 // 10 AS xhi,
      |         olo + (ohi - olo) // 10 AS ylo,
      |         olo + (ohi - olo) * 2 // 10 AS yhi
      |  FROM b)
      |SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supp
      |FROM lineitem, x
      |WHERE l_partkey >= xlo AND l_partkey < xhi
      |  AND l_orderkey >= ylo AND l_orderkey < yhi
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin
}
