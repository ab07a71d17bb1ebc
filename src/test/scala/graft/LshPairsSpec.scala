package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{LshPairs, TextOps}

/** r16 #1 — the durable verified-pairs store. Pins:
  * (1) the full build's stored pairs equal an independent in-test
  *     recompute of the q45 construction, and a repeat resolve on an
  *     unchanged corpus is a pure LOAD (no build/append counters);
  * (2) an APPEND verifies only new candidate pairs (appends ticks,
  *     fullBuilds does not; feed files scanned == the delta) and the
  *     resulting pair set is EXACTLY the from-scratch recompute over
  *     the combined corpus — the incremental path's exactness;
  * (3) a delta that pushes a standing shingle over the df cap forces
  *     the full rebuild the corpus-global cap semantics demand
  *     (capCrossRebuilds ticks) — and the result is again exact;
  * (4) a corpus MUTATION rebuilds. */
class LshPairsSpec extends SparkSpec {

  private def withConfs[T](pairs: (String, String)*)(f: => T): T = {
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally pairs.foreach { case (k, _) => spark.conf.unset(k) }
  }

  /** Near-dup family fixture: docs (2f, 2f+1) share a 12-token base;
    * the odd twin appends one tail token (10 of 11 shingles shared,
    * J ≈ 0.91). The 9973 modulus keeps cross-family shingle overlap
    * incidental and every shingle far under the df cap. */
  private def docs(ids: Seq[Int]) = {
    import spark.implicits._
    ids.map { i =>
      val fam = i / 2
      val base = (0 until 12).map(k => s"w${(fam * 7 + k * 3) % 9973}")
        .mkString(" ")
      val text = if (i % 2 == 0) base else s"$base tail$i"
      (i.toLong, "src", text)
    }.toDF("doc_id", "source", "text")
  }

  /** Independent recompute of the q45 construction (shingle cap,
    * signatures, bands, exact-Jaccard verify) — the expectation every
    * store path is held to. */
  private def refPairs(docsDf: DataFrame): Seq[(Long, Long, Double)] = {
    val raw = docsDf
      .withColumn("toks", split(trim(col("text")), "\\s+"))
      .filter(size(col("toks")) >= 3)
      .withColumn("sh", explode(expr(
        "transform(sequence(1, size(toks) - 2), " +
          "i -> concat_ws(' ', slice(toks, i, 3)))")))
      .select(col("doc_id"), col("sh")).distinct()
    val hot = raw.groupBy(col("sh")).agg(count(lit(1)).as("df"))
      .filter(col("df") > TextOps.MaxShingleDf).select(col("sh"))
    val sh = raw.join(hot, Seq("sh"), "left_anti").cache()
    try {
      val sigCols = (0 until 16).map(i =>
        min(md5(concat(lit(s"$i|"), col("sh")))).as(s"h$i"))
      val sig = sh.groupBy(col("doc_id")).agg(sigCols.head, sigCols.tail: _*)
      val bands = sig.select(col("doc_id"), explode(array(
        (0 until 4).map { b =>
          struct(lit(b).as("band_id"),
            md5(concat_ws("|",
              (0 until 4).map(r => col(s"h${b * 4 + r}")): _*))
              .as("band_hash"))
        }: _*)).as("band"))
        .select(col("doc_id"), col("band.band_id"), col("band.band_hash"))
        .cache()
      try {
        val cand = bands.as("a").join(bands.as("b"),
            col("a.band_id") === col("b.band_id") &&
            col("a.band_hash") === col("b.band_hash") &&
            col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
          .distinct()
        val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
        cand
          .join(sh.withColumnRenamed("doc_id", "doc_a")
            .withColumnRenamed("sh", "sh_a"), "doc_a")
          .join(sh.withColumnRenamed("doc_id", "doc_b")
            .withColumnRenamed("sh", "sh_b"), "doc_b")
          .filter(col("sh_a") === col("sh_b"))
          .groupBy(col("doc_a"), col("doc_b"))
          .agg(count(lit(1)).as("common"))
          .join(sizes.withColumnRenamed("doc_id", "doc_a")
            .withColumnRenamed("n_sh", "n_a"), "doc_a")
          .join(sizes.withColumnRenamed("doc_id", "doc_b")
            .withColumnRenamed("n_sh", "n_b"), "doc_b")
          .withColumn("jaccard", col("common").cast("double") /
            (col("n_a") + col("n_b") - col("common")))
          .filter(col("jaccard") >= 0.5)
          .select(col("doc_a"), col("doc_b"), col("jaccard"))
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
          .toSeq.sorted
      } finally { bands.unpersist(); () }
    } finally { sh.unpersist(); () }
  }

  private def stored(dir: String): Seq[(Long, Long, Double)] =
    LshPairs.pairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq.sorted

  test("full build equals the independent recompute; an unchanged " +
      "corpus resolves as a pure load") {
    val dir = TempDirs.create("graft_lshpairs_corp")
    docs(0 until 240).coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    withConfs("spark.graft.lshpairs.dir" ->
        TempDirs.create("graft_lshpairs_root")) {
      LshPairs.clearMemo()
      val builds0 = LshPairs.fullBuilds.get()
      val p1 = stored(dir)
      assert(LshPairs.fullBuilds.get() === builds0 + 1)
      assert(p1.nonEmpty, "the planted families must pair up")
      assert(p1 === refPairs(spark.read.parquet(s"$dir/documents.parquet")))
      // the load path: a "fresh JVM" (memo dropped) must serve the
      // committed generation without any build or append
      LshPairs.clearMemo()
      val builds1 = LshPairs.fullBuilds.get()
      val appends1 = LshPairs.appends.get()
      assert(stored(dir) === p1)
      assert(LshPairs.fullBuilds.get() === builds1 &&
        LshPairs.appends.get() === appends1,
        "an unchanged corpus must LOAD, never recompute")
    }
  }

  test("an append verifies only new candidates and lands EXACTLY the " +
      "from-scratch pair set") {
    val dir = TempDirs.create("graft_lshpairs_corp2")
    docs(0 until 200).coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    withConfs("spark.graft.lshpairs.dir" ->
        TempDirs.create("graft_lshpairs_root2")) {
      LshPairs.clearMemo()
      val p1 = stored(dir)
      val builds0 = LshPairs.fullBuilds.get()
      val appends0 = LshPairs.appends.get()
      val scanned0 = LshPairs.feedFilesScanned.get()
      // the delta: exact duplicates of standing docs 0..19 under new
      // ids (guaranteed cross standing↔new pairs — identical shingle
      // sets agree on every band) plus fresh families
      import spark.implicits._
      val dup = (0 until 20).map { i =>
        val fam = i / 2
        val base = (0 until 12).map(k => s"w${(fam * 7 + k * 3) % 9973}")
          .mkString(" ")
        val text = if (i % 2 == 0) base else s"$base tail$i"
        ((1000 + i).toLong, "src", text)
      }.toDF("doc_id", "source", "text")
      dup.unionByName(docs(1100 until 1140)).coalesce(1)
        .write.mode("append").parquet(s"$dir/documents.parquet")
      val p2 = stored(dir)
      assert(LshPairs.fullBuilds.get() === builds0,
        "a cap-safe append must not trigger a full rebuild")
      assert(LshPairs.appends.get() === appends0 + 1)
      assert(LshPairs.feedFilesScanned.get() === scanned0 + 1,
        "the append must shingle exactly the appended feed file")
      assert(p2 === refPairs(spark.read.parquet(s"$dir/documents.parquet")),
        "the incremental pair set must equal the from-scratch recompute")
      val newPairs = p2.map(t => (t._1, t._2)).toSet --
        p1.map(t => (t._1, t._2)).toSet
      assert(newPairs.exists { case (a, b) => a < 1000 && b >= 1000 },
        s"standing↔new duplicates must pair, got $newPairs")
    }
  }

  test("a delta pushing a standing shingle over the df cap forces the " +
      "full rebuild the corpus-global cap demands") {
    import spark.implicits._
    val dir = TempDirs.create("graft_lshpairs_corp3")
    // 98 standing docs share the "c0 c1 c2" shingle (df 98 ≤ cap 100)
    def hotDocs(ids: Seq[Int]) = ids.map(i =>
      (i.toLong, "src", s"c0 c1 c2 u${i}a u${i}b u${i}c"))
      .toDF("doc_id", "source", "text")
    hotDocs(0 until 98).coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    withConfs("spark.graft.lshpairs.dir" ->
        TempDirs.create("graft_lshpairs_root3")) {
      LshPairs.clearMemo()
      stored(dir)
      val cross0 = LshPairs.capCrossRebuilds.get()
      val appends0 = LshPairs.appends.get()
      // +10 sharers → combined df 108 > 100: the shingle leaves every
      // standing capped set, so standing signatures would change
      hotDocs(500 until 510).coalesce(1).write.mode("append")
        .parquet(s"$dir/documents.parquet")
      val p = stored(dir)
      assert(LshPairs.capCrossRebuilds.get() === cross0 + 1,
        "a cap crossing must be detected and counted")
      assert(LshPairs.appends.get() === appends0,
        "a cap crossing must rebuild, not append")
      assert(p === refPairs(spark.read.parquet(s"$dir/documents.parquet")))
    }
  }

  test("cluster labels are a durable per-generation artifact: " +
      "computed once, loaded thereafter, equal to a direct CC") {
    val dir = TempDirs.create("graft_lshpairs_corp5")
    docs(0 until 160).coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    withConfs("spark.graft.lshpairs.dir" ->
        TempDirs.create("graft_lshpairs_root5")) {
      LshPairs.clearMemo()
      val lb0 = LshPairs.labelBuilds.get()
      def lab(): Seq[(Long, Long)] = LshPairs.labels(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      val l1 = lab()
      assert(LshPairs.labelBuilds.get() === lb0 + 1)
      assert(l1.nonEmpty)
      // fresh-JVM simulation: the labels load with zero recompute
      LshPairs.clearMemo()
      assert(lab() === l1)
      assert(LshPairs.labelBuilds.get() === lb0 + 1,
        "an unchanged corpus must LOAD the labels, never recompute")
      val expect = graft.operators.GraphOps.connectedComponentsStar(
        LshPairs.pairs(spark, dir).select(col("doc_a"), col("doc_b")))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      assert(l1 === expect,
        "stored labels must equal the direct star-contraction CC")
      // an append commits a new generation → labels recompute ONCE for
      // it (over the union pair set), then load again
      docs(1000 until 1040).coalesce(1).write.mode("append")
        .parquet(s"$dir/documents.parquet")
      val l2 = lab()
      assert(LshPairs.labelBuilds.get() === lb0 + 2)
      assert(lab() === l2)
      assert(LshPairs.labelBuilds.get() === lb0 + 2)
    }
  }

  test("a corpus mutation rebuilds from scratch") {
    val dir = TempDirs.create("graft_lshpairs_corp4")
    docs(0 until 100).coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    withConfs("spark.graft.lshpairs.dir" ->
        TempDirs.create("graft_lshpairs_root4")) {
      LshPairs.clearMemo()
      stored(dir)
      val builds0 = LshPairs.fullBuilds.get()
      docs(300 until 420).coalesce(1).write.mode("overwrite")
        .parquet(s"$dir/documents.parquet")
      val p = stored(dir)
      assert(LshPairs.fullBuilds.get() === builds0 + 1,
        "a mutated feed must rebuild")
      assert(p === refPairs(spark.read.parquet(s"$dir/documents.parquet")))
      // one-prior retention (r16 self-review): the rebuild keeps the
      // prior generation AND its referenced deltas for in-flight
      // readers; the NEXT commit reclaims them
      val root = new java.io.File(LshPairs.root(spark, dir))
      def gens(): Set[String] = root.listFiles().toSeq
        .filter(_.isDirectory).map(_.getName).filter(_.startsWith("gen-"))
        .toSet
      assert(gens() === Set("gen-0", "gen-1"),
        s"the prior generation must survive its successor's commit, " +
          s"got ${gens()}")
      docs(500 until 560).coalesce(1).write.mode("overwrite")
        .parquet(s"$dir/documents.parquet")
      stored(dir)
      assert(gens() === Set("gen-1", "gen-2"),
        s"the second commit must reclaim the twice-superseded " +
          s"generation, got ${gens()}")
    }
  }
}
