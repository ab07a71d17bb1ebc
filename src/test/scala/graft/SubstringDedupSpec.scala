package graft

import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** q141 exact repeated-substring detection (Lee et al. 2022 semantics):
  * a token position is duplicated iff its 8-gram occurs more than once
  * anywhere in the corpus — another doc OR another offset of the same
  * doc — and overlapping flagged extents merge into maximal spans. The
  * fixture hand-computes all of it: a 10-token run shared across two
  * docs (3 flagged grams merging into ONE span of exactly the run
  * length), a within-doc repeat (two spans, 8 tokens each), a doc under
  * the gram size (excluded from grams, still counted in the census),
  * and a clean doc.
  */
class SubstringDedupSpec extends SparkSpec {

  test("shared runs, self-repeats, and short docs aggregate exactly") {
    import spark.implicits._
    val dir = TempDirs.create("graft_substr")
    val shared = (1 to 10).map(i => s"s$i").mkString(" ") // 10-token shared run
    val rep = (1 to 8).map(i => s"r$i").mkString(" ")     // 8-token self-repeat
    val docs = Seq(
      // doc 1: u1..u4 | S1..S10 | v1..v6  -> flagged grams at pos 4,5,6 -> one span of 10
      (1L, s"u1 u2 u3 u4 $shared v1 v2 v3 v4 v5 v6", "en", "web", 60L),
      // doc 2: w1 w2 | S1..S10 | z1..z8 -> one span of 10
      (2L, s"w1 w2 $shared z1 z2 z3 z4 z5 z6 z7 z8", "en", "web", 60L),
      // doc 3: R1..R8 m1 m2 m3 R1..R8 m4 -> grams at pos 0 and 11 match
      // each other; gap 11 > 8 so TWO spans of 8 tokens each
      (3L, s"$rep m1 m2 m3 $rep m4", "en", "web", 60L),
      // doc 4: below the gram size -> no grams, still in the census
      (4L, "t1 t2 t3 t4 t5", "en", "web", 20L),
      // doc 5: 20 unique tokens, clean
      (5L, (1 to 20).map(i => s"q$i").mkString(" "), "en", "web", 60L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    val out = TextOps.q141SubstringDedup(spark, dir).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[String]("source") === "web")
    assert(r.getAs[Long]("n_docs") === 5L)
    assert(r.getAs[Long]("n_docs_with_dup") === 3L)
    assert(r.getAs[Long]("total_tokens") === (20 + 20 + 20 + 5 + 20).toLong)
    // doc1: 10, doc2: 10, doc3: 2 * 8
    assert(r.getAs[Long]("dup_tokens") === 36L)
    assert(r.getAs[Long]("n_spans") === 4L)
    assert(r.getAs[Long]("max_span_len") === 10L)
    assert(r.getAs[Double]("dup_frac6") === 0.423529)
  }

  test("adjacent flagged grams merge; a gap over the gram size splits") {
    import spark.implicits._
    val dir = TempDirs.create("graft_substr_merge")
    // Two docs sharing TWO separate 9-token runs with an 11-token unique
    // middle in each: flagged gram starts {2,3} and {22,23} per doc —
    // the within-run starts merge (gap 1 <= 8), the across-run gap
    // (22 - 3 = 19 > 8) splits -> 2 spans of 9 per doc.
    val runA = (1 to 9).map(i => s"a$i").mkString(" ")
    val runB = (1 to 9).map(i => s"b$i").mkString(" ")
    def mid(tag: String) = (1 to 11).map(i => s"$tag$i").mkString(" ")
    val docs = Seq(
      (1L, s"x1 x2 $runA ${mid("c")} $runB x3 x4", "en", "web", 60L),
      (2L, s"y1 y2 $runA ${mid("d")} $runB y3 y4", "en", "web", 60L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val r = TextOps.q141SubstringDedup(spark, dir).collect().head
    assert(r.getAs[Long]("n_spans") === 4L)       // 2 per doc
    assert(r.getAs[Long]("dup_tokens") === 36L)   // 4 spans x 9
    assert(r.getAs[Long]("max_span_len") === 9L)
  }

  test("gate-scale run is sane: fractions bounded, spans imply flagged docs") {
    val rows = TextOps.q141SubstringDedup(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("dup_tokens") <= r.getAs[Long]("total_tokens"))
      assert(r.getAs[Long]("n_spans") >= r.getAs[Long]("n_docs_with_dup"))
      val f = r.getAs[Double]("dup_frac6")
      assert(f >= 0.0 && f <= 1.0)
    }
  }
}
