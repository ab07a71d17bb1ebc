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
  *    projection is the codec stub) -> hamming 0, an exact perceptual
  *    pair over byte-different payloads;
  *  - an identical payload under a DIFFERENT media_type must never
  *    pair (dedup is per-modality).
  */
class PhashSpec extends SparkSpec {

  // 128 printable-ASCII chars, deterministic, mean-diverse blocks
  private val base: String = (0 until 128).map(i => (32 + (i * 37 + 11) % 95).toChar).mkString

  private def mediaDf(rows: Seq[(Long, String, Array[Byte])]) = {
    import spark.implicits._
    rows.toDF("doc_id", "media_type", "payload")
  }

  test("cross-block byte swap is a near-dup; non-ASCII injection is an exact dup") {
    val chars = base.toCharArray
    // swap chars 0 and 2 — different aHash blocks (128 chars / 64 blocks
    // = 2 chars per block); for THIS base string the two changed block
    // sums each cross the global-mean threshold: hamming is exactly 2
    // (computed offline; a swap that flips nothing would make this pair
    // exact and void the near-dup arm of the test)
    assert(chars(0) != chars(2))
    val t = chars(0); chars(0) = chars(2); chars(2) = t
    val swapped = new String(chars)
    // pure non-ASCII injection only: an ASCII-mixed insert (e.g. "café")
    // would leave its ASCII residue in the projection and shift blocks
    val unicodeJunk = base.substring(0, 50) + "日本語の全部テキスト" + base.substring(50)
    val rows = Seq(
      (1L, "image", base.getBytes("UTF-8")),
      (2L, "image", swapped.getBytes("UTF-8")),
      (3L, "image", (0 until 128).map(i => (32 + (i * 53 + 7) % 95).toChar).mkString.getBytes("UTF-8")),
      (5L, "image", unicodeJunk.getBytes("UTF-8")),
      (9L, "audio", base.getBytes("UTF-8"))) // same payload, other modality
    val out = MultimodalOps.phashReport(mediaDf(rows)).collect()
      .map(r => r.getAs[String]("media_type") -> r).toMap

    val img = out("image")
    assert(img.getAs[Long]("n_items") === 4L)
    // (1,5) hamming 0 (projection strips the junk); (1,2) and (2,5)
    // hamming 2 (the swap's two flipped bits)
    assert(img.getAs[Long]("n_exact_pairs") === 1L)
    assert(img.getAs[Long]("n_neardup_pairs") === 3L)
    assert(img.getAs[Long]("n_dup_items") === 3L)
    assert(img.getAs[Long]("min_hamming") === 0L)

    // the audio copy of doc 1's payload must not cross modalities
    val aud = out("audio")
    assert(aud.getAs[Long]("n_items") === 1L)
    assert(aud.getAs[Long]("n_cand_pairs") === 0L)
    assert(aud.getAs[Long]("min_hamming") === -1L)
  }

  test("within-block reorder preserves the hash exactly (block sums are order-free)") {
    val chars = base.toCharArray
    // chars 10 and 11 share a 2-char block; swapping them preserves
    // every block sum -> identical 64-bit hash -> exact pair
    assert(chars(10) != chars(11))
    val t = chars(10); chars(10) = chars(11); chars(11) = t
    val rows = Seq(
      (1L, "image", base.getBytes("UTF-8")),
      (2L, "image", new String(chars).getBytes("UTF-8")))
    val out = MultimodalOps.phashReport(mediaDf(rows)).collect().head
    assert(out.getAs[Long]("n_exact_pairs") === 1L)
  }

  test("payloads under 64 projected chars are excluded; gate-scale run is sane") {
    val rows = Seq(
      (1L, "image", "short payload".getBytes("UTF-8")),
      (2L, "image", base.getBytes("UTF-8")))
    val out = MultimodalOps.phashReport(mediaDf(rows)).collect()
    assert(out.length === 1 && out.head.getAs[Long]("n_items") === 1L)

    val gate = MultimodalOps.q140PhashNearDup(spark, Sf).collect()
    assert(gate.length === 3)
    gate.foreach { r =>
      assert(r.getAs[Long]("n_items") > 0L)
      assert(r.getAs[Long]("n_neardup_pairs") <= r.getAs[Long]("n_cand_pairs"))
    }
  }
}
