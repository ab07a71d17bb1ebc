package graft

import org.apache.spark.sql.functions._

import graft.operators.{VecGate, VectorOps, ZIndex}

/** q191 — the streaming embedding near-dup gate over the durable
  * sign-LSH index. Pins:
  * (1) the AvailableNow gate emits exactly its batch twin's pairs
  *     (same probes/join/threshold/dedup, batch execution);
  * (2) soundness and guaranteed recall: every emitted pair's
  *     brute-force cosine clears the threshold, and every planted
  *     EXACT duplicate (identical vector → identical buckets in all
  *     tables) is emitted at sim6 == 1.0;
  * (3) an appended feed is an O(delta) index APPEND (zAppends, not
  *     zBuilds) and newly-standing vectors start gating matching
  *     incoming vectors. */
class VecGateSpec extends SparkSpec {

  private def withConfs[T](pairs: (String, String)*)(f: => T): T =
    TempDirs.zConfLock.synchronized {
      pairs.foreach { case (k, v) => spark.conf.set(k, v) }
      try f finally pairs.foreach { case (k, _) => spark.conf.unset(k) }
    }

  private def vec(seed: Int): Array[Float] = {
    val r = new scala.util.Random(seed)
    Array.fill(64)((r.nextDouble() * 2 - 1).toFloat)
  }

  /** Embeddings with planted exact duplicates across the %10 split:
    * every id ≡ 0 (mod 20) — an incoming-stream id — carries the SAME
    * vector as standing id + 1; all other ids get independent
    * seed-deterministic vectors. */
  private def embs(ids: Range) = {
    import spark.implicits._
    ids.map { i =>
      val seed = if (i % 20 == 0) i + 1 else i
      (i.toLong, vec(seed), i % 7)
    }.toDF("vec_id", "embedding", "label")
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq.sorted

  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    val (dot, na, nb) = (0 until 64).foldLeft((0.0, 0.0, 0.0)) {
      case ((d, x, y), k) =>
        (d + a(k).toDouble * b(k).toDouble,
          x + a(k).toDouble * a(k).toDouble,
          y + b(k).toDouble * b(k).toDouble)
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  test("q191: the AvailableNow gate equals its batch twin; emitted " +
      "pairs are sound and every exact duplicate is caught at 1.0") {
    val dir = TempDirs.create("graft_vecgate_corp")
    val ids = 0 until 300
    embs(ids).coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    withConfs("spark.graft.zindex.dir" ->
        TempDirs.create("graft_vecgate_root")) {
      ZIndex.clearMemo()
      val stream = rows(VecGate.q191StreamVecGate(spark, dir))
      val batch = rows(VecGate.batchGate(spark, dir))
      assert(stream === batch,
        "the AvailableNow gate must equal the batch twin exactly")
      // soundness: every emitted pair clears the threshold brute-force
      val byId = ids.map(i => i.toLong ->
        vec(if (i % 20 == 0) i + 1 else i)).toMap
      stream.foreach { case (q, b, sim6) =>
        assert(q % 10 == 0 && b % 10 != 0, s"split violated: ($q, $b)")
        val bf = cosine(byId(q), byId(b))
        assert(math.abs(bf - sim6) < 1e-5,
          s"emitted sim6 $sim6 disagrees with brute-force $bf for ($q, $b)")
        assert(bf >= 0.4 - 1e-6, s"unsound pair ($q, $b) at $bf")
      }
      // guaranteed recall: identical vectors share every bucket
      val dups = ids.filter(_ % 20 == 0)
        .map(i => (i.toLong, (i + 1).toLong)).toSet
      val got = stream.map(t => (t._1, t._2)).toSet
      assert(dups.subsetOf(got),
        s"exact duplicates missed: ${dups -- got}")
      stream.filter(t => dups.contains((t._1, t._2)))
        .foreach { case (q, b, sim6) =>
          assert(sim6 === 1.0, s"exact dup ($q, $b) must gate at 1.0") }
    }
  }

  test("an appended feed is an O(delta) index append whose new " +
      "standing vectors start gating matching incoming vectors") {
    val dir = TempDirs.create("graft_vecgate_corp2")
    embs(0 until 300).coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    withConfs("spark.graft.zindex.dir" ->
        TempDirs.create("graft_vecgate_root2")) {
      ZIndex.clearMemo()
      val before = rows(VecGate.batchGate(spark, dir))
        .map(t => (t._1, t._2)).toSet
      // id 10 is an incoming vector with a unique seed — unmatched
      assert(!before.exists(_._1 == 10L),
        "fixture: incoming id 10 must start unmatched")
      val builds0 = ZIndex.zBuilds.get()
      val appends0 = ZIndex.zAppends.get()
      import spark.implicits._
      // append STANDING vectors (ids ≢ 0 mod 10): 1001 duplicates
      // incoming id 10's vector, 1002 is new and unrelated
      Seq((1001L, vec(10), 1), (1002L, vec(100002), 2))
        .toDF("vec_id", "embedding", "label")
        .coalesce(1).write.mode("append").parquet(s"$dir/embeddings.parquet")
      val after = rows(VecGate.batchGate(spark, dir))
        .map(t => (t._1, t._2)).toSet
      assert(ZIndex.zBuilds.get() === builds0,
        "an append must not rebuild the vector index")
      assert(ZIndex.zAppends.get() === appends0 + 1,
        "an append must run the incremental index path")
      assert(after.contains((10L, 1001L)),
        s"the newly-standing duplicate must gate incoming id 10: $after")
    }
  }

  test("many tiny micro-batches (maxFilesPerTrigger=1) emit exactly " +
      "the single-batch result — per-batch dedup equals global dedup") {
    val dir = TempDirs.create("graft_vecgate_corp4")
    embs(0 until 300).coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    withConfs(
      "spark.graft.zindex.dir" -> TempDirs.create("graft_vecgate_root4"),
      "spark.graft.gate.maxFilesPerTrigger" -> "1") {
      ZIndex.clearMemo()
      val stream = rows(VecGate.q191StreamVecGate(spark, dir))
      val batch = rows(VecGate.batchGate(spark, dir))
      assert(stream === batch,
        "the multi-batch gate must equal the batch twin exactly")
      assert(batch.nonEmpty)
    }
  }

  test("a wider width is a RESHARD into a fresh layout (full build), " +
      "and the gate keeps its guaranteed recall at the new width") {
    // every test corpus resolves to the B(N) floor — the precondition
    // for the static-width DuckDB oracle
    assert(VectorOps.lshBitsFor(300) === VectorOps.DefaultLshBits)
    val dir = TempDirs.create("graft_vecgate_corp3")
    val ids = 0 until 300
    embs(ids).coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    withConfs("spark.graft.zindex.dir" ->
        TempDirs.create("graft_vecgate_root3")) {
      ZIndex.clearMemo()
      rows(VecGate.batchGate(spark, dir)) // arm the B=8 layout
      val builds0 = ZIndex.zBuilds.get()
      val wide = rows(VecGate.batchGateAt(spark, dir,
        VectorOps.DefaultLshBits + 1))
      assert(ZIndex.zBuilds.get() === builds0 + 1,
        "a new width must land as a separate full layout build")
      val dups = ids.filter(_ % 20 == 0)
        .map(i => (i.toLong, (i + 1).toLong)).toSet
      val got = wide.map(t => (t._1, t._2)).toSet
      assert(dups.subsetOf(got),
        s"exact duplicates missed at the resharded width: ${dups -- got}")
    }
  }
}
