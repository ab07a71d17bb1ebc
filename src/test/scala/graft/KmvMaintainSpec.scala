package graft

import org.apache.spark.sql.functions._
import graft.operators.KmvTable

/** q151/q161 incremental sketch-table maintenance, manifest-generation
  * form (r10 verdict #2): fresh build must equal the daily bottom-k
  * definitions (BOTH columns — the KMV kept set and the quantile value
  * sample, from one scan); a no-op maintenance must scan ZERO files; an
  * append must scan ONLY the appended file, WRITE only the touched
  * partitions (the untouched table rides forward by manifest reference,
  * not by copy), and land on the same table a from-scratch build
  * produces; generations are swept by reference, never while a live
  * manifest points into them; a crash mid-maintenance (uncommitted
  * generation) is invisible to readers and swept by the next write; a
  * corpus MUTATION forces a full rebuild; legacy pre-manifest layouts
  * are migrated, not left lingering; an empty first corpus commits
  * cleanly instead of dying on schema inference.
  */
class KmvMaintainSpec extends SparkSpec {

  private def withTableDir[T](f: String => T): T = {
    val dir = TempDirs.create("graft_kmv_tbl")
    spark.conf.set("spark.graft.kmv.tableDir", dir)
    try f(dir) finally spark.conf.unset("spark.graft.kmv.tableDir")
  }

  private def ksRows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getDate(1).toString) ->
      r.getSeq[String](2).toList).toMap

  private def smpRows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getDate(1).toString) ->
      r.getSeq[org.apache.spark.sql.Row](2)
        .map(s => (s.getString(0), s.getLong(1))).toList).toMap

  /** statsView rows: (type, day) -> (n, vmin, vmax, kv). */
  private def statRows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getDate(1).toString) ->
      ((r.getLong(2), r.getLong(3), r.getLong(4),
        r.getSeq[String](5).toList))).toMap

  /** keyStatsView rows: (type, day) -> (nu, umin, umax, ksf pairs). */
  private def keyRows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getDate(1).toString) ->
      ((r.getLong(2), r.getLong(3), r.getLong(4),
        r.getSeq[org.apache.spark.sql.Row](5)
          .map(p => (p.getString(0), p.getLong(1))).toList))).toMap

  private def ev(ids: Range, day: Int) = {
    import spark.implicits._
    ids.map { i =>
      (i.toLong, java.sql.Timestamp.valueOf(f"2024-01-$day%02d 12:00:00"),
        (i % 500).toLong, "click", i / 100.0)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
  }

  test("fresh build equals the daily bottom-k definitions (gate data, both columns)") {
    withTableDir { _ =>
      val t = ksRows(KmvTable.kmvView(spark, Sf))
      val naive = graft.sources.Tables.events(spark, Sf)
        .filter(col("user_id").isNotNull)
        .select(col("event_type"), to_date(col("ts")).as("d"),
          md5(col("user_id").cast("string")).as("h"))
        .distinct()
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("event_type"), col("d")).orderBy(col("h"))))
        .filter(col("rn") <= 64)
        .groupBy(col("event_type"), col("d"))
        .agg(sort_array(collect_list(col("h"))).as("ks"))
        .collect().map(r => (r.getString(0), r.getDate(1).toString) ->
          r.getSeq[String](2).toList).toMap
      assert(t === naive)
      // the quantile sample column, same one-scan maintenance pass:
      // bottom-64-by-md5(event_id) with cent values attached
      val q = smpRows(KmvTable.quantileView(spark, Sf))
      val naiveQ = graft.sources.Tables.events(spark, Sf)
        .filter(col("value").isNotNull)
        .select(col("event_type"), to_date(col("ts")).as("d"),
          md5(col("event_id").cast("string")).as("h"),
          (col("value").cast("decimal(18,2)") * lit(100)).cast("long").as("v"))
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("event_type"), col("d")).orderBy(col("h"))))
        .filter(col("rn") <= 64)
        .groupBy(col("event_type"), col("d"))
        .agg(sort_array(collect_list(struct(col("h"), col("v")))).as("smp"))
        .collect().map(r => (r.getString(0), r.getDate(1).toString) ->
          r.getSeq[org.apache.spark.sql.Row](2)
            .map(s => (s.getString(0), s.getLong(1))).toList).toMap
      assert(q === naiveQ)
      // and the oracled query over the same table is well-formed
      val qq = KmvTable.q151KmvMaintain(spark, Sf).collect()
      assert(qq.length === t.size)
      qq.foreach { r =>
        if (r.getAs[Long]("n_kept") < 64)
          assert(r.getAs[Double]("kmv_estimate") ===
            r.getAs[Long]("n_distinct").toDouble) // saturation rule
      }
    }
  }

  test("append scans only the new file and matches a from-scratch build") {
    // corpus A: two days in one part file
    val full = TempDirs.create("graft_kmv_corpA")
    ev(1 to 1000, 1).union(ev(1001 to 1600, 2))
      .coalesce(1).write.parquet(s"$full/events.parquet")
    val (fromScratch, fromScratchQ, fromScratchS, fromScratchK) = withTableDir { _ =>
      (ksRows(KmvTable.kmvView(spark, full)),
       smpRows(KmvTable.quantileView(spark, full)),
       statRows(KmvTable.statsView(spark, full)),
       keyRows(KmvTable.keyStatsView(spark, full)))
    }

    // corpus B: same rows, landed as two files with a maintenance run
    // between — the incremental path must converge to the same table.
    // The appended file carries MORE day-1 rows plus the new day 2, so
    // the same-(type, day) merge path runs under the equality pins:
    // the stored day-1 ksf partial merges with the new rows through the
    // count-weighted aggregate (ADD on duplicate hashes), smp/kv
    // union-resketch, and the scalar stats re-sum
    val incr = TempDirs.create("graft_kmv_corpB")
    ev(1 to 800, 1).coalesce(1).write.parquet(s"$incr/events.parquet")
    withTableDir { _ =>
      KmvTable.maintain(spark, incr)
      val before = KmvTable.filesScanned.get()
      // no-op maintenance: zero files scanned
      KmvTable.maintain(spark, incr)
      assert(KmvTable.filesScanned.get() === before)
      // append the day-1 tail and day 2 as a second part file
      graft.streaming.EventsStream.landFeedFile(
        ev(801 to 1000, 1).union(ev(1001 to 1600, 2)),
        s"$incr/events.parquet", "append01")
      val t2 = ksRows(KmvTable.kmvView(spark, incr))
      assert(KmvTable.filesScanned.get() === before + 1,
        "append must scan exactly the one new file")
      assert(t2 === fromScratch,
        "incremental merge must converge to the from-scratch table")
      assert(smpRows(KmvTable.quantileView(spark, incr)) === fromScratchQ,
        "quantile samples must converge too (same maintenance pass)")
      // the statistics bundle merges exactly: counts add across the
      // disjoint daily row sets, bounds take min/max, the value-KMV
      // union-resketches — incremental == from-scratch, field by field
      val s = statRows(KmvTable.statsView(spark, incr))
      assert(s === fromScratchS,
        "stats bundle must converge too (n / vmin / vmax / kv)")
      // and the counts are the population truth, not an estimate
      s.foreach { case ((_, day), (n, vmin, vmax, _)) =>
        val ids = if (day.endsWith("01")) (1 to 1000) else (1001 to 1600)
        assert(n === ids.size.toLong)
        // value = i/100.0 dollars => exactly i cents
        assert(vmin === ids.head.toLong && vmax === ids.last.toLong,
          s"cents bounds for $day: got ($vmin, $vmax)")
      }
      // the key-tier bundle converges too — frequencies included (the
      // downward-closure merge law through the actual table machinery)
      assert(keyRows(KmvTable.keyStatsView(spark, incr)) === fromScratchK,
        "key bundle must converge too (nu / umin / umax / ksf)")
    }
  }

  test("append writes only touched partitions; untouched ride by manifest reference") {
    val dir = TempDirs.create("graft_kmv_gens")
    withTableDir { tbl =>
      ev(1 to 800, 1).coalesce(1).write.parquet(s"$dir/events.parquet")
      KmvTable.maintain(spark, dir).count() // gen-0
      graft.streaming.EventsStream.landFeedFile(
        ev(801 to 1600, 2), s"$dir/events.parquet", "append01")
      KmvTable.maintain(spark, dir).count() // gen-1
      // only the appended day's partition was re-sketched/rewritten
      assert(KmvTable.lastRewrittenPartitions.get() ===
        Set("pet=click/pd=2024-01-02"))
      // the new generation PHYSICALLY contains only the touched
      // partition — the r10 byte-copy of the untouched table forward
      // is gone (this is the verdict's file-count pin)
      def partDirs(gen: String): Set[String] = {
        val parts = new java.io.File(s"$tbl/$gen/parts")
        assert(parts.isDirectory, s"missing parts dir in $gen")
        (for {
          pet <- parts.listFiles.toSeq if pet.isDirectory
          pd <- pet.listFiles.toSeq if pd.isDirectory
        } yield s"${pet.getName}/${pd.getName}").toSet
      }
      assert(partDirs("gen-0") === Set("pet=click/pd=2024-01-01"))
      assert(partDirs("gen-1") === Set("pet=click/pd=2024-01-02"),
        "append generation must hold ONLY the appended day")
      // the manifest maps the untouched day to its ORIGINAL owning
      // generation — readers still see the full table
      val manifest = scala.io.Source.fromFile(s"$tbl/gen-1/manifest")
        .getLines().map { l => val Array(g, rel) = l.split("\t", 2); rel -> g.toLong }
        .toMap
      assert(manifest === Map(
        "pet=click/pd=2024-01-01" -> 0L, "pet=click/pd=2024-01-02" -> 1L))
      assert(KmvTable.maintain(spark, dir).count() === 2)
      // commit protocol: both generations committed; gen-0 is ALIVE
      // (it owns a live partition), not merely retained
      assert(new java.io.File(s"$tbl/gen-0/_COMMITTED").exists)
      assert(new java.io.File(s"$tbl/gen-1/_COMMITTED").exists)
      // an uncommitted partial generation is invisible to readers and
      // swept by the next maintenance write (crash mid-maintain shape)
      new java.io.File(s"$tbl/gen-7/parts").mkdirs()
      val noop = KmvTable.maintain(spark, dir)
      assert(noop.count() === 2) // still served from the gen-1 manifest
      graft.streaming.EventsStream.landFeedFile(
        ev(1601 to 2000, 3), s"$dir/events.parquet", "append02")
      KmvTable.maintain(spark, dir).count() // gen-2
      assert(!new java.io.File(s"$tbl/gen-7").exists,
        "uncommitted leftover must be swept")
      assert(new java.io.File(s"$tbl/gen-2/_COMMITTED").exists)
      // REFERENCE sweep: gen-0 and gen-1 both still own live
      // partitions (days 1 and 2) — neither may be deleted
      assert(new java.io.File(s"$tbl/gen-0").exists,
        "a generation owning live partitions must survive the sweep")
      assert(new java.io.File(s"$tbl/gen-1").exists)
      assert(ksRows(KmvTable.kmvView(spark, dir)).keySet ===
        Set(("click", "2024-01-01"), ("click", "2024-01-02"),
          ("click", "2024-01-03")))
    }
  }

  test("append whose new day is all-null in both families still commits readably") {
    // self-review r11: explode/inline ELIMINATE a group whose kept
    // arrays are both empty, but the manifest had already promised the
    // partition to the new generation — the merge must anchor on the
    // touched key set or the table wedges on a committed reference to
    // a dir that was never written
    import spark.implicits._
    val dir = TempDirs.create("graft_kmv_nulls")
    withTableDir { _ =>
      ev(1 to 300, 1).coalesce(1).write.parquet(s"$dir/events.parquet")
      KmvTable.maintain(spark, dir).count() // gen-0
      val nulls = Seq((9001L, java.sql.Timestamp.valueOf("2024-01-05 10:00:00")))
        .toDF("event_id", "ts")
        .select(col("event_id"), col("ts"),
          lit(null).cast("bigint").as("user_id"),
          lit("click").as("event_type"),
          lit(null).cast("double").as("value"))
      graft.streaming.EventsStream.landFeedFile(
        nulls, s"$dir/events.parquet", "nulls01")
      val t = KmvTable.maintain(spark, dir)
      assert(t.count() === 2, "the all-null day must land as an empty-sketch row")
      assert(KmvTable.kmvView(spark, dir).count() === 1)
      assert(KmvTable.quantileView(spark, dir).count() === 1)
      assert(KmvTable.maintain(spark, dir).count() === 2,
        "subsequent maintenance must read the committed table")
    }
  }

  test("stale rebuild keeps generations the last committed manifest references") {
    // self-review r11: on a mutation-forced rebuild the sweep must key
    // on the PRIOR COMMITTED manifest (what an in-flight lazy reader of
    // the previous table still reads), not the emptied base manifest
    val dir = TempDirs.create("graft_kmv_stale")
    withTableDir { tbl =>
      ev(1 to 300, 1).coalesce(1).write.parquet(s"$dir/events.parquet")
      KmvTable.maintain(spark, dir).count() // gen-0 owns day 1
      graft.streaming.EventsStream.landFeedFile(
        ev(301 to 600, 2), s"$dir/events.parquet", "a1")
      val reader = KmvTable.maintain(spark, dir) // gen-1; manifest {d1→0, d2→1}
      // mutate in place => full rebuild into gen-2
      ev(1 to 100, 3).coalesce(1).write.mode("overwrite")
        .parquet(s"$dir/events.parquet")
      KmvTable.maintain(spark, dir).count()
      assert(new java.io.File(s"$tbl/gen-0").exists,
        "a generation referenced by the prior committed manifest must survive")
      assert(new java.io.File(s"$tbl/gen-1").exists)
      // the in-flight lazy reader of the prior table still completes
      assert(reader.count() === 2)
    }
  }

  test("family views prune the other family's column at the parquet scan") {
    // the table stores BOTH kept-set families; a ks-only consumer
    // (q146/q148/q151) must not pay the smp bytes and vice versa —
    // at 100 TB-table dimensions the unpruned read doubles the IO of
    // every downstream sketch query
    withTableDir { _ =>
      KmvTable.maintain(spark, Sf).count()
      def readCols(df: org.apache.spark.sql.DataFrame): Set[String] =
        df.queryExecution.sparkPlan.collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec =>
            f.requiredSchema.fieldNames.toSet
        }.flatten.toSet
      val kmvCols = readCols(KmvTable.kmvView(spark, Sf))
      assert(kmvCols.contains("ksf") &&
        Seq("kss", "smp", "kv", "n", "vmin", "vmax", "nu", "umin", "umax")
          .forall(!kmvCols.contains(_)),
        s"kmvView must prune every other family at the scan, read: $kmvCols")
      val qCols = readCols(KmvTable.quantileView(spark, Sf))
      assert(qCols.contains("smp") &&
        Seq("ksf", "kss", "kv", "n", "vmin", "vmax", "nu", "umin", "umax")
          .forall(!qCols.contains(_)),
        s"quantileView must prune every other family at the scan, read: $qCols")
      val sCols = readCols(KmvTable.statsView(spark, Sf))
      assert(Seq("n", "vmin", "vmax", "kv").forall(sCols.contains) &&
        Seq("ksf", "kss", "smp", "nu", "umin", "umax").forall(!sCols.contains(_)),
        s"statsView must prune the kept-set families, read: $sCols")
      val kCols = readCols(KmvTable.keyStatsView(spark, Sf))
      assert(Seq("nu", "umin", "umax", "ksf").forall(kCols.contains) &&
        Seq("kss", "smp", "kv", "n", "vmin", "vmax").forall(!kCols.contains(_)),
        s"keyStatsView must prune the value families, read: $kCols")
      val ssCols = readCols(KmvTable.saltedKeyView(spark, Sf))
      assert(ssCols.contains("kss") &&
        Seq("ksf", "smp", "kv", "n", "vmin", "vmax", "nu", "umin", "umax")
          .forall(!ssCols.contains(_)),
        s"saltedKeyView must prune every other family, read: $ssCols")
    }
  }

  test("corpus mutation forces a full rebuild, never a stale merge") {
    import spark.implicits._
    def mev(ids: Range, users: Int) = ids.map { i =>
      (i.toLong, java.sql.Timestamp.valueOf("2024-02-01 08:00:00"),
        (i % users).toLong, "view", 1.0)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    val dir = TempDirs.create("graft_kmv_mut")
    mev(1 to 300, 100).coalesce(1).write.parquet(s"$dir/events.parquet")
    withTableDir { tbl =>
      KmvTable.maintain(spark, dir)
      val rebuildsBefore = KmvTable.fullRebuilds.get()
      // REGENERATE the corpus in place: same path, different contents
      mev(1 to 300, 37).coalesce(1).write.mode("overwrite")
        .parquet(s"$dir/events.parquet")
      val t = ksRows(KmvTable.kmvView(spark, dir))
      assert(KmvTable.fullRebuilds.get() === rebuildsBefore + 1,
        "mutated corpus must trip the per-file identity check")
      // table reflects ONLY the new corpus: 37 distinct users
      assert(t(("view", "2024-02-01")).size === 37)
      // after one more maintenance the pre-mutation generation (now
      // unreferenced by both live manifests) is swept
      graft.streaming.EventsStream.landFeedFile(
        mev(301 to 400, 37), s"$dir/events.parquet", "postmut")
      KmvTable.maintain(spark, dir).count()
      assert(!new java.io.File(s"$tbl/gen-0").exists,
        "an unreferenced stale generation must eventually be swept")
    }
  }

  test("legacy pre-manifest layout is migrated by rebuild, stale dirs deleted") {
    val dir = TempDirs.create("graft_kmv_legacy")
    ev(1 to 500, 1).coalesce(1).write.parquet(s"$dir/events.parquet")
    withTableDir { tbl =>
      // fabricate the r9 flat layout AND an r10 manifest-less committed
      // generation
      import spark.implicits._
      Seq(("x", "2020-01-01")).toDF("a", "b")
        .write.parquet(s"$tbl/sketches")
      Seq(("x", "2020-01-01")).toDF("a", "b")
        .write.parquet(s"$tbl/gen-0/sketches")
      Seq(("f", 1L, 2L)).toDF("name", "len", "mtime")
        .write.parquet(s"$tbl/gen-0/consumed")
      new java.io.File(s"$tbl/gen-0/_COMMITTED").createNewFile()
      val t = ksRows(KmvTable.kmvView(spark, dir))
      assert(t.keySet === Set(("click", "2024-01-01")),
        "legacy layout must be rebuilt from the corpus")
      assert(!new java.io.File(s"$tbl/sketches").exists,
        "r9 flat dirs must be deleted, not left lingering")
      assert(!new java.io.File(s"$tbl/gen-0/sketches").exists,
        "manifest-less generations must be deleted")
      assert(new java.io.File(s"$tbl/gen-0/manifest").exists,
        "the migrated table is a fresh manifest generation")
    }
  }

  test("pre-current-format generations force one migrating rebuild") {
    // a committed manifest generation WITHOUT the current format marker
    // is an older table schema: reading it through the new schema would
    // silently null-fill the statistics columns — the marker routes it
    // through the legacy path (one full rebuild) instead
    val dir = TempDirs.create("graft_kmv_fmt")
    ev(1 to 500, 1).coalesce(1).write.parquet(s"$dir/events.parquet")
    withTableDir { tbl =>
      val t0 = statRows(KmvTable.statsView(spark, dir))
      // simulate an older-format layout: drop the format markers
      new java.io.File(tbl).listFiles().filter(_.getName.startsWith("gen-"))
        .foreach { g => new java.io.File(g, KmvTable.FormatMarker).delete(); () }
      val rebuilds = KmvTable.fullRebuilds.get()
      val t1 = statRows(KmvTable.statsView(spark, dir))
      assert(KmvTable.fullRebuilds.get() === rebuilds + 1,
        "missing format marker must force exactly one rebuild")
      assert(t1 === t0, "the migrated table must be identical")
      // and the rebuild re-stamped the marker: the next maintenance is
      // a no-op again
      val before = KmvTable.filesScanned.get()
      KmvTable.maintain(spark, dir)
      assert(KmvTable.filesScanned.get() === before)
    }
  }

  test("generation sprawl is bounded: compaction folds the manifest, feed-free") {
    // 9 single-day appends with maxGenerations=4: without compaction
    // the manifest would reference 9 generations forever (one per run —
    // reads listing O(runs) dirs, the sweep never reclaiming); with it,
    // whenever the prospective reference count would exceed 4 the run
    // rewrites every live partition into the new generation. The
    // rewrite must cost table reads only (filesScanned counts ONLY the
    // appended feed files throughout) and converge to the from-scratch
    // table exactly.
    val full = TempDirs.create("graft_kmv_compA")
    (1 to 9).map(d => ev(d * 100 + 1 to d * 100 + 80, d))
      .reduce(_ union _).coalesce(1).write.parquet(s"$full/events.parquet")
    val expected = withTableDir { _ =>
      (ksRows(KmvTable.kmvView(spark, full)),
       statRows(KmvTable.statsView(spark, full)),
       keyRows(KmvTable.keyStatsView(spark, full)))
    }
    val incr = TempDirs.create("graft_kmv_compB")
    ev(101 to 180, 1).coalesce(1).write.parquet(s"$incr/events.parquet")
    spark.conf.set("spark.graft.kmv.maxGenerations", "4")
    try withTableDir { tbl =>
      KmvTable.maintain(spark, incr).count()
      val before = KmvTable.filesScanned.get()
      (2 to 9).foreach { d =>
        graft.streaming.EventsStream.landFeedFile(
          ev(d * 100 + 1 to d * 100 + 80, d),
          s"$incr/events.parquet", f"append$d%03d")
        KmvTable.maintain(spark, incr).count()
      }
      assert(KmvTable.filesScanned.get() === before + 8,
        "compaction must be table-IO only: the feed scan count is the appends'")
      // the live manifest references at most maxGenerations generations
      val genDirs = new java.io.File(tbl).listFiles()
        .filter(_.getName.startsWith("gen-")).map(_.getName).toSet
      assert(genDirs.size <= 6, // ≤4 referenced + current/prior retention
        s"generation fan-out must stay bounded, saw ${genDirs.size}: $genDirs")
      // and the table is exactly the from-scratch build, all families
      assert(ksRows(KmvTable.kmvView(spark, incr)) === expected._1)
      assert(statRows(KmvTable.statsView(spark, incr)) === expected._2)
      assert(keyRows(KmvTable.keyStatsView(spark, incr)) === expected._3)
    } finally spark.conf.unset("spark.graft.kmv.maxGenerations")
  }

  test("empty first corpus commits cleanly and appends recover") {
    import spark.implicits._
    val dir = TempDirs.create("graft_kmv_empty")
    // a real parquet file with ZERO rows (schema in the footer only)
    ev(1 to 1, 1).filter(lit(false))
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    withTableDir { tbl =>
      val t0 = KmvTable.maintain(spark, dir)
      assert(t0.count() === 0, "empty corpus => empty typed table")
      assert(new java.io.File(s"$tbl/gen-0/_COMMITTED").exists,
        "the empty maintenance must still commit (files are consumed)")
      val before = KmvTable.filesScanned.get()
      KmvTable.maintain(spark, dir)
      assert(KmvTable.filesScanned.get() === before,
        "empty file must be consumed, not rescanned forever")
      // a later append builds the real table incrementally
      graft.streaming.EventsStream.landFeedFile(
        ev(1 to 300, 2), s"$dir/events.parquet", "append01")
      assert(ksRows(KmvTable.kmvView(spark, dir)).keySet ===
        Set(("click", "2024-01-02")))
    }
  }
}
