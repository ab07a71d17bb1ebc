package graft

import graft.operators.TextOps

/** q145 curation funnel: one fixture exercises every stage — a
  * short doc and a punctuation wall die at the quality gate, an exact
  * twin dies at content dedup, a one-word-changed clone dies at the
  * near-dup cluster keep (it IS a q45 verified pair: jaccard ≈ 0.7 ≥
  * 0.5), and a doc sharing a 5-gram with the held-out eval partition
  * (md5 prefix ≥ 'e6' — doc_id 3 hashes 'ec') dies at decontamination.
  * The census is hand-derived.
  */
class FunnelSpec extends SparkSpec {

  test("every stage drops exactly its designed victim") {
    import spark.implicits._
    val dir = TempDirs.create("graft_funnel")
    val clean = (1 to 20).map(i => s"w$i").mkString(" ")
    val nearClone = clean.replace("w10", "wx")
    val twin = "dupa dupb dupc dupd dupe dupf"
    val evalText = "mark1 mark2 mark3 mark4 mark5 filler1 filler2"
    val contaminated = "pre1 pre2 mark1 mark2 mark3 mark4 mark5 post1"
    def row(id: Long, text: String) = (id, text, "en", "web", text.length.toLong)
    val docs = Seq(
      row(3L, evalText),      // md5("3")='ec' -> EVAL partition, not in census
      row(1L, clean),         // survives everything
      row(6L, nearClone),     // near-dup of 1 -> dropped at cluster keep
      row(2L, twin), row(4L, twin), // exact twins -> 4 dropped at content dedup
      row(7L, contaminated),  // shares the eval 5-gram -> dropped at decontam
      row(5L, "a b c d"),     // 4 tokens -> dropped at quality
      row(8L, "!!! ??? ;;; ::: %%% ^^^ &&&")) // punct wall -> dropped at quality
    docs.map(d => (d._1, d._2, d._3, d._4, d._5))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    val out = TextOps.q145CurationFunnel(spark, dir).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n_raw") === 7L)      // eval doc 3 excluded
    assert(r.getAs[Long]("n_quality") === 5L)  // -5 (short), -8 (punct)
    assert(r.getAs[Long]("n_exact") === 4L)    // -4 (twin of 2)
    assert(r.getAs[Long]("n_near") === 3L)     // -6 (verified near-dup of 1)
    assert(r.getAs[Long]("n_final") === 2L)    // -7 (eval 5-gram hit)
    assert(r.getAs[Long]("final_tokens") === (20 + 6).toLong)
    assert(r.getAs[Double]("yield6") === 0.285714)
  }

  test("gate-scale funnel is monotone per source") {
    val rows = TextOps.q145CurationFunnel(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val seq = Seq(r.getAs[Long]("n_raw"), r.getAs[Long]("n_quality"),
        r.getAs[Long]("n_exact"), r.getAs[Long]("n_near"), r.getAs[Long]("n_final"))
      assert(seq.zip(seq.tail).forall { case (a, b) => a >= b },
        s"funnel must be monotone, got $seq")
    }
  }
}
