package graft

import org.apache.spark.sql.functions._
import graft.multimodal.MultimodalOps

/** q140 perceptual-hash near-dup: the gate corpus has no true media
  * near-dups (its near-dup columns legitimately read 0 there), so the
  * DETECTION semantics are pinned here on constructed payloads with
  * provable hamming bounds:
  *
  *  - swapping two bytes ACROSS aHash blocks changes two block sums and
  *    leaves the global mean intact -> at most 2 of 64 bits flip -> the
  *    pair must survive both banding (>= 2 of 4 bands untouched) and
  *    the hamming <= 6 gate;
  *  - injecting non-ASCII bytes is invisible (the printable-ASCII
  *    projection is the codec stub) -> identical hash, so the pair
  *    collapses into one exact-dup GROUP (group-first counting: exact
  *    mass is a group-size census, never enumerated pairs);
  *  - an identical payload under a DIFFERENT media_type must never
  *    group or pair (dedup is per-modality);
  *  - the band-bucket cap (spark.graft.phash.bandCap) prunes degenerate
  *    bands from candidate generation — capped at 1 nothing pairs,
  *    at the default the near pair is found.
  */
class PhashSpec extends SparkSpec {

  // 128 printable-ASCII chars, deterministic, mean-diverse blocks
  private val base: String = (0 until 128).map(i => (32 + (i * 37 + 11) % 95).toChar).mkString

  private def mediaDf(rows: Seq[(Long, String, Array[Byte])]) = {
    import spark.implicits._
    rows.toDF("doc_id", "media_type", "payload")
  }

  private def fixture = {
    val chars = base.toCharArray
    // swap chars 0 and 2 — different aHash blocks (128 chars / 64 blocks
    // = 2 chars per block); for THIS base string the two changed block
    // sums each cross the global-mean threshold: hamming is exactly 2
    // (computed offline; a swap that flips nothing would collapse the
    // pair into the exact group and void the near-dup arm of the test)
    assert(chars(0) != chars(2))
    val t = chars(0); chars(0) = chars(2); chars(2) = t
    val swapped = new String(chars)
    // pure non-ASCII injection only: an ASCII-mixed insert (e.g. "café")
    // would leave its ASCII residue in the projection and shift blocks
    val unicodeJunk = base.substring(0, 50) + "日本語の全部テキスト" + base.substring(50)
    mediaDf(Seq(
      (1L, "image", base.getBytes("UTF-8")),
      (2L, "image", swapped.getBytes("UTF-8")),
      (3L, "image", (0 until 128).map(i => (32 + (i * 53 + 7) % 95).toChar).mkString.getBytes("UTF-8")),
      (5L, "image", unicodeJunk.getBytes("UTF-8")),
      (9L, "audio", base.getBytes("UTF-8")))) // same payload, other modality
  }

  test("cross-block byte swap is a near-dup; non-ASCII injection joins the exact group") {
    val out = MultimodalOps.phashReport(fixture).collect()
      .map(r => r.getAs[String]("media_type") -> r).toMap

    val img = out("image")
    assert(img.getAs[Long]("n_items") === 4L)
    // groups: {1,5} (projection strips the junk), {2}, {3}
    assert(img.getAs[Long]("n_hashes") === 3L)
    assert(img.getAs[Long]("n_exact_dup_items") === 1L)
    // one near pair between representatives: (group{1,5}, 2) at hamming 2,
    // covering 2 + 1 underlying items
    assert(img.getAs[Long]("n_neardup_pairs") === 1L)
    assert(img.getAs[Long]("n_neardup_items") === 3L)
    assert(img.getAs[Long]("min_hamming") === 2L)

    // the audio copy of doc 1's payload must not cross modalities
    val aud = out("audio")
    assert(aud.getAs[Long]("n_items") === 1L)
    assert(aud.getAs[Long]("n_hashes") === 1L)
    assert(aud.getAs[Long]("n_exact_dup_items") === 0L)
    assert(aud.getAs[Long]("n_cand_pairs") === 0L)
    assert(aud.getAs[Long]("min_hamming") === -1L)
  }

  test("the band cap prunes degenerate buckets; the default cap keeps real pairs") {
    spark.conf.set("spark.graft.phash.bandCap", "1")
    try {
      val capped = MultimodalOps.phashReport(fixture).collect()
        .map(r => r.getAs[String]("media_type") -> r).toMap
      // every multi-hash bucket pruned: no candidates anywhere, but the
      // group census (exact dups) is untouched — it never needed pairs
      assert(capped("image").getAs[Long]("n_cand_pairs") === 0L)
      assert(capped("image").getAs[Long]("n_exact_dup_items") === 1L)
    } finally spark.conf.unset("spark.graft.phash.bandCap")
    val dflt = MultimodalOps.phashReport(fixture).collect()
      .map(r => r.getAs[String]("media_type") -> r).toMap
    assert(dflt("image").getAs[Long]("n_neardup_pairs") === 1L)
  }

  test("within-block reorder preserves the hash exactly (block sums are order-free)") {
    val chars = base.toCharArray
    // chars 10 and 11 share a 2-char block; swapping them preserves
    // every block sum -> identical 64-bit hash -> one exact group
    assert(chars(10) != chars(11))
    val t = chars(10); chars(10) = chars(11); chars(11) = t
    val out = MultimodalOps.phashReport(mediaDf(Seq(
      (1L, "image", base.getBytes("UTF-8")),
      (2L, "image", new String(chars).getBytes("UTF-8"))))).collect().head
    assert(out.getAs[Long]("n_hashes") === 1L)
    assert(out.getAs[Long]("n_exact_dup_items") === 1L)
    assert(out.getAs[Long]("n_cand_pairs") === 0L) // singleton bucket: nothing to pair
  }

  test("payloads under 64 projected chars are excluded; gate-scale run is sane") {
    val out = MultimodalOps.phashReport(mediaDf(Seq(
      (1L, "image", "short payload".getBytes("UTF-8")),
      (2L, "image", base.getBytes("UTF-8"))))).collect()
    assert(out.length === 1 && out.head.getAs[Long]("n_items") === 1L)

    val gate = MultimodalOps.q140PhashNearDup(spark, Sf).collect()
    assert(gate.length === 3)
    gate.foreach { r =>
      assert(r.getAs[Long]("n_items") > 0L)
      assert(r.getAs[Long]("n_hashes") <= r.getAs[Long]("n_items"))
      assert(r.getAs[Long]("n_neardup_pairs") <= r.getAs[Long]("n_cand_pairs"))
    }
  }
}
