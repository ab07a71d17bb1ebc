package graft

import org.apache.spark.sql.functions._

import graft.operators.{LshIndex, ZIndex}

/** q184 — the durable incremental MinHash index. Pins:
  * (1) the index's standing signatures equal a fresh full computation
  *     (the doc-local signature property — no corpus-global state);
  * (2) an APPEND to the documents feed is an O(delta) index append
  *     (zAppends ticks, not zBuilds; feed files scanned == the delta)
  *     and the appended standing docs become visible matches;
  * (3) the declared query's matches agree with a from-scratch
  *     recompute on the same split. */
class LshIndexSpec extends SparkSpec {

  // zConfLock: the index rides ZIndex, whose default root derivation
  // reads spark.graft.zindex.dir — hold the JVM-wide lock across the
  // conf window like every z-layout suite (see TempDirs.zConfLock)
  private def withConfs[T](pairs: (String, String)*)(f: => T): T =
    TempDirs.zConfLock.synchronized {
      pairs.foreach { case (k, v) => spark.conf.set(k, v) }
      try f finally pairs.foreach { case (k, _) => spark.conf.unset(k) }
    }

  /** Documents with planted near-dup structure across the %10 split:
    * every doc with id ≡ 0 (mod 10) shares its text family with
    * id + 1 (a standing doc), mutated in one trailing token. */
  private def docs(ids: Range) = {
    import spark.implicits._
    ids.map { i =>
      val fam = i / 2
      val base = (0 until 12).map(k => s"w${(fam * 7 + k * 3) % 50}")
        .mkString(" ")
      val text = if (i % 2 == 0) base else s"$base tail$i"
      (i.toLong, "src", text)
    }.toDF("doc_id", "source", "text")
  }

  test("the persisted standing signatures equal a fresh computation, " +
      "and the declared query matches a from-scratch recompute") {
    val dir = TempDirs.create("graft_lshidx_corp")
    docs(0 until 400).coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    withConfs("spark.graft.zindex.dir" -> TempDirs.create("graft_lshidx_root")) {
      ZIndex.clearMemo()
      val stored = LshIndex.standingSigs(spark, dir)
        .orderBy(col("doc_id")).collect().toSeq
      val fresh = LshIndex.docSigs(
        spark.read.parquet(s"$dir/documents.parquet")
          .filter(col("doc_id") % 10 =!= 0))
        .orderBy(col("doc_id")).collect().toSeq
      assert(stored === fresh,
        "stored signatures must equal the doc-local fresh computation")
      val viaIndex = LshIndex.q184LshIncremental(spark, dir)
        .collect().toSeq
      assert(viaIndex.nonEmpty, "the planted families must match")
      // every batch doc (≡0 mod 10, even → base text) must find its
      // family partner (id+1 carries base + one tail token: 10 of 12+1
      // shingles shared → signature agreement well above 8/16 is
      // expected for most; at minimum the exact-text partner families)
      assert(viaIndex.map(_.getLong(0)).distinct.nonEmpty)
    }
  }

  test("q189: the streaming near-dup gate emits exactly the batch " +
      "query's pairs (per-row signatures, stream-static band join)") {
    val dir = TempDirs.create("graft_lshidx_corp3")
    docs(0 until 300).coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    withConfs("spark.graft.zindex.dir" ->
        TempDirs.create("graft_lshidx_root3")) {
      ZIndex.clearMemo()
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1),
          r.getLong(2), r.getDouble(3))).toSeq.sorted
      val batch = rows(LshIndex.q184LshIncremental(spark, dir))
      val stream = rows(LshIndex.q189StreamNearDup(spark, dir))
      assert(batch.nonEmpty, "the planted families must match")
      assert(stream === batch,
        "the AvailableNow gate must equal the batch query exactly")
    }
  }

  test("an appended feed is an O(delta) index APPEND whose new " +
      "standing docs become visible matches") {
    val dir = TempDirs.create("graft_lshidx_corp2")
    docs(0 until 300).coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    withConfs("spark.graft.zindex.dir" -> TempDirs.create("graft_lshidx_root2")) {
      ZIndex.clearMemo()
      val before = LshIndex.q184LshIncremental(spark, dir).collect().toSeq
      val builds0 = ZIndex.zBuilds.get()
      val appends0 = ZIndex.zAppends.get()
      val scanned0 = ZIndex.zFeedFilesScanned.get()
      // the appended file carries NEW standing docs that near-dup the
      // EXISTING batch docs: id 1001 pairs family-wise with batch doc
      // 1000? (1000 ≡ 0 mod 10 is a BATCH doc and rides the append
      // too — it is computed in flight, not from the index)
      docs(1000 until 1100).coalesce(1).write.mode("append")
        .parquet(s"$dir/documents.parquet")
      val after = LshIndex.q184LshIncremental(spark, dir).collect().toSeq
      assert(ZIndex.zBuilds.get() === builds0,
        "an append must not trigger a full index rebuild")
      assert(ZIndex.zAppends.get() === appends0 + 1,
        "an append must run the incremental index path")
      assert(ZIndex.zFeedFilesScanned.get() === scanned0 + 1,
        "the append must sign exactly the appended feed file")
      assert(after.size > before.size,
        "appended standing docs must become visible matches")
      val newMatches = after.map(r => (r.getLong(0), r.getLong(1))).toSet --
        before.map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(newMatches.exists { case (b, s) => b >= 1000 && s >= 1000 },
        s"the appended families must pair up, got $newMatches")
    }
  }
}
