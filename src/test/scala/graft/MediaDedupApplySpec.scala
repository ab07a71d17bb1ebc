package graft

import graft.multimodal.MultimodalOps

/** q142 media dedup apply: components must single-link across the exact
  * and near edge kinds (a corrupted copy and a non-ASCII-padded copy of
  * the same original merge through it, whether or not they also pair
  * directly), the kept item is the component minimum, and items under
  * the 64-byte fingerprint floor are always kept — you cannot dedup
  * what you cannot hash.
  *
  * doc_ids are chosen for the mediaTable modality rule (doc_id % 3:
  * 0 = image, 1 = audio): 3/6/9/12/15 are images, 4 is audio.
  */
class MediaDedupApplySpec extends SparkSpec {

  private val base: String = (0 until 128).map(i => (32 + (i * 37 + 11) % 95).toChar).mkString

  test("exact and near edges merge into one component; short payloads always survive") {
    import spark.implicits._
    val dir = TempDirs.create("graft_media_apply")
    val chars = base.toCharArray
    val t = chars(0); chars(0) = chars(2); chars(2) = t // hamming-2 near-dup of base
    val docs = Seq(
      (3L, base, "en", "web", 128L),                                     // image: original
      (6L, new String(chars), "en", "web", 128L),                        // image: near copy
      (9L, base.substring(0, 50) + "日本語の全部テキスト" + base.substring(50), // image: exact after projection
        "en", "web", 140L),
      (12L, (0 until 128).map(i => (32 + (i * 53 + 7) % 95).toChar).mkString, // image: unrelated
        "en", "web", 128L),
      (15L, "tiny", "en", "web", 4L),                                    // image: under the floor
      (4L, base, "en", "web", 128L))                                     // audio: same bytes, other modality
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    val out = MultimodalOps.q142MediaDedupApply(spark, dir).collect()
      .map(r => r.getAs[String]("media_type") -> r).toMap
    val img = out("image")
    // component {3, 6, 9} keeps 3; 12 unrelated; 15 unfingerprintable
    assert(img.getAs[Long]("n_raw") === 5L)
    assert(img.getAs[Long]("n_kept") === 3L)
    assert(img.getAs[Long]("n_dropped") === 2L)
    // kept bytes = utf-8 bytes of docs 3, 12, 15
    assert(img.getAs[Long]("kept_bytes") ===
      (base.getBytes("UTF-8").length + 128 + 4).toLong)
    // the audio twin of doc 3's payload is its own component
    val aud = out("audio")
    assert(aud.getAs[Long]("n_kept") === 1L && aud.getAs[Long]("n_dropped") === 0L)
  }

  test("gate-scale run is consistent with the q140 report") {
    val apply = MultimodalOps.q142MediaDedupApply(spark, Sf).collect()
      .map(r => r.getAs[String]("media_type") -> r).toMap
    val report = MultimodalOps.q140PhashNearDup(spark, Sf).collect()
      .map(r => r.getAs[String]("media_type") -> r).toMap
    assert(apply.size === 3)
    apply.foreach { case (mt, r) =>
      val dropped = r.getAs[Long]("n_dropped")
      assert(r.getAs[Long]("n_kept") + dropped === r.getAs[Long]("n_raw"))
      // dropping cannot exceed the items q140 sees as exact or near dups
      val ceiling = report(mt).getAs[Long]("n_exact_dup_items") +
        report(mt).getAs[Long]("n_neardup_items")
      assert(dropped <= ceiling)
    }
  }
}
