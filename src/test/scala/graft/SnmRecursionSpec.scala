package graft

import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** q136's recursive blocking key is a performance regime, not a
  * semantics change: on a boilerplate-prefix corpus the deeper key
  * splits a hot block into sub-blocks whose boundaries fall between
  * documents that are far apart in edit distance anyway, so the
  * d ≤ 10 pair set must survive refinement exactly. This pins it: the
  * uniform path (default threshold — the fixture's hot block is below
  * 10 000 docs) and the forced-recursion path (threshold dropped so
  * the sampled probe fires at depth 2 AND 3) must emit identical
  * pairs, including every by-construction clone pair.
  *
  * doc_ids 27/63/134/138 are chosen INSIDE the md5-sampled 1/64 slice
  * (hex prefix ≤ '03') so the dropped threshold provably trips hot1
  * and hot2 — a fixture of arbitrary ids could miss the sample and
  * pass vacuously through the uniform path.
  */
class SnmRecursionSpec extends SparkSpec {

  test("forced deep recursion preserves the pair set of the uniform path") {
    import spark.implicits._
    val dir = TempDirs.create("graft_snm_rec")
    // 40 docs, ALL sharing the two-token boilerplate prefix "aa bb";
    // third token splits them into 20 clone pairs (xNN), each pair
    // within d<=10 and unrelated to every other subgroup (distinct
    // random-ish tails far beyond d=10 of each other).
    // each md5-sampled id (hex prefix <= '03') pairs with an UNSAMPLED
    // partner: every (aa, bb, x<g>) sub-block then holds at most one
    // sampled doc, so the probe stops at depth 3 — a depth-4 key would
    // consume the tail token that differs between clones and split
    // every pair (the recall cliff the depth cap exists to avoid)
    val sampledIds = Seq(27L, 63L, 134L, 138L) // md5 2-hex prefix <= '03'
    val groups: Seq[Seq[Long]] =
      sampledIds.zipWithIndex.map { case (s, g) => Seq(s, 1000L + g) } ++
        (4 until 20).map(g => Seq(1000L + 2 * g, 1001L + 2 * g))
    val docs = groups.zipWithIndex.flatMap { case (members, g) =>
      members.sorted.zipWithIndex.map { case (id, m) =>
        // two group digits per word: adjacent groups differ by >= 12
        // edits (>10 gate), pair members by exactly 6 (<=10 gate);
        // 6 words keeps every text inside the 80-char compared prefix
        val tail = Seq.fill(6)(s"w${g}g${g}t$m").mkString(" ")
        (id, s"aa bb x$g $tail", "en", "web", 60L)
      }
    }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    val uniform = TextOps.q136SortedNeighborhood(spark, dir).collect().toSeq
    spark.conf.set("spark.graft.snm.hotBlockDocs", "64") // HotSampled = 1
    try {
      val recursed = TextOps.q136SortedNeighborhood(spark, dir).collect().toSeq
      assert(recursed === uniform)
    } finally spark.conf.unset("spark.graft.snm.hotBlockDocs")
    // every clone pair found (w-1 = 2 window spans the adjacent clone)
    val pairs = uniform.map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = groups.map(g => (g.min, g.max)).toSet
    assert(expected.subsetOf(pairs))
  }
}
