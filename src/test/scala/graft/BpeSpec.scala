package graft

import graft.operators.TextOps

/** q143 BPE merge training, pinned on the classic Sennrich-style
  * fixture (low/lower/newest/widest) whose five merges are hand-derived,
  * plus the greedy non-overlap rule: in "aaaa" the pair (a,a) matches
  * twice left-to-right (positions 0 and 2), never three times — and the
  * round-2 merge is (aa,aa), which only exists if round 1 merged
  * non-overlapping.
  */
class BpeSpec extends SparkSpec {

  private def writeDocs(dir: String, text: String): Unit = {
    import spark.implicits._
    Seq((1L, text, "en", "web", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
  }

  test("the classic vocabulary yields the hand-derived merge table") {
    val dir = TempDirs.create("graft_bpe")
    writeDocs(dir, ("low " * 5 + "lower " * 2 + "newest " * 6 + "widest " * 3).trim)
    val out = TextOps.q143BpeMerges(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(out.toSeq === Seq(
      (1L, "e", "s", "es", 9L),
      (2L, "es", "t", "est", 9L),
      (3L, "l", "o", "lo", 7L),
      (4L, "lo", "w", "low", 7L),
      (5L, "e", "w", "ew", 6L)))
  }

  test("merges are greedy left-to-right and never overlap") {
    val dir = TempDirs.create("graft_bpe_greedy")
    // 'aaaa' x3 plus a filler word so later rounds still have pairs
    writeDocs(dir, "aaaa aaaa aaaa ab")
    val out = TextOps.q143BpeMerges(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(4)))
    // (a,a) in 'aaaa' counts 3 non-overlapping-agnostic ADJACENCIES (the
    // count is over positions), but the MERGE is non-overlapping: round 2
    // must see (aa,aa) — an overlapping merge would leave (aa,a) instead.
    // After round 3 no pairs remain anywhere: the run stops at 3 merges.
    assert(out.length === 3)
    assert(out(0) === ((1L, "a", "a", 9L)))
    assert(out(1) === ((2L, "aa", "aa", 3L)))
    assert(out(2) === ((3L, "a", "b", 1L)))
  }

  test("q147 encode: global symbol reduction equals the sum of training merge frequencies") {
    // each training round's freq counts the merge occurrences replaced
    // over the whole word-frequency dictionary; encode replays the same
    // replaces over the same multiset (split by source), so the total
    // token reduction must equal the sum of the merge freqs EXACTLY
    val merges = TextOps.q143BpeMerges(spark, Sf).collect()
    val enc = TextOps.queries("q147_bpe_encode")(spark, Sf).collect()
    val reduction = enc.map(r =>
      r.getAs[Long]("tok_before") - r.getAs[Long]("tok_after")).sum
    assert(reduction === merges.map(_.getAs[Long]("freq")).sum)
    enc.foreach { r =>
      assert(r.getAs[Long]("tok_after") <= r.getAs[Long]("tok_before"))
      assert(r.getAs[Double]("compression") >= 1.0)
    }
  }

  test("gate-scale merge table is well-formed") {
    val rows = TextOps.q143BpeMerges(spark, Sf).collect()
    assert(rows.length === 5)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(0) === (i + 1).toLong)
      assert(r.getString(3) === r.getString(1) + r.getString(2))
      assert(r.getLong(4) > 0L)
    }
    // merge frequencies never increase within the run of a fixed pair
    // universe... they CAN (a merged symbol creates new pairs), so pin
    // only the deterministic shape above.
  }
}
