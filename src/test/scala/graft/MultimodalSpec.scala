package graft

import org.apache.spark.sql.functions._
import graft.multimodal.MultimodalOps

class MultimodalSpec extends SparkSpec {

  test("media table: payload bytes round-trip the source text") {
    val m = MultimodalOps.mediaTable(spark, Sf)
      .withColumn("text_back", col("payload").cast("string"))
    val docs = graft.sources.Tables.documents(spark, Sf).select("doc_id", "text")
    val bad = m.join(docs, "doc_id").filter(col("text_back") =!= col("text"))
    assert(bad.count() === 0)
  }

  test("decode stub produces one feature row per media row, deterministic") {
    val f1 = MultimodalOps.extractFeatures(spark, Sf).collect().sortBy(_.doc_id)
    val f2 = MultimodalOps.extractFeatures(spark, Sf).collect().sortBy(_.doc_id)
    assert(f1.length === 500)
    assert(f1.map(_.doc_id).toSeq === f2.map(_.doc_id).toSeq)
    assert(f1.zip(f2).forall { case (a, b) =>
      a.n_bytes == b.n_bytes && a.byte_mean == b.byte_mean &&
        a.embedding.toSeq == b.embedding.toSeq })
    assert(f1.forall(_.embedding.length == 8))
    assert(f1.forall(f => f.n_bytes > 0 && f.byte_mean > 0))
  }

  test("resize stub: strided byte subsample, ceil-divided dims, empty-safe") {
    def row(id: Long, bytes: Array[Byte], w: Int, h: Int) =
      MultimodalOps.MediaRow(id, "image", bytes, w, h)
    val out = MultimodalOps.resizePartition(
      Iterator(row(1, Array[Byte](10, 20, 30, 40, 50), 100, 50),
               row(2, Array.empty[Byte], 7, 7)), factor = 4).toSeq
    assert(out(0) === MultimodalOps.ResizedMedia(1, 25, 13, 2, 10, 60L)) // bytes 0,4
    assert(out(1) === MultimodalOps.ResizedMedia(2, 2, 2, 0, 0, 0L))
  }

  test("frame sampling: every 2nd frame, partial last frame kept") {
    val bytes = Array.tabulate(600)(i => (i % 100).toByte) // frames: 0..255,256..511,512..599
    val out = MultimodalOps.sampleFramesPartition(
      Iterator(MultimodalOps.MediaRow(7, "video", bytes, 0, 0)),
      frameBytes = 256, every = 2).toSeq
    assert(out.map(_.frame_idx) === Seq(0, 2)) // frame 1 skipped
    assert(out(0).n_bytes === 256 && out(1).n_bytes === 88) // 600-512
    assert(out(0).first_byte === 0 && out(1).first_byte === 12) // 512 % 100
    assert(out(0).byte_sum === (0 until 256).map(_ % 100).sum.toLong)
    assert(out(1).byte_sum === (512 until 600).map(_ % 100).sum.toLong)
  }

  test("metadata queries do not require payload decode (column pruning)") {
    val plan = MultimodalOps.mediaTable(spark, Sf)
      .select("doc_id", "media_type", "width")
      .queryExecution.executedPlan.toString
    // the parquet scan must not read the text column backing the payload
    assert(plan.contains("ReadSchema") && !plan.contains("text"), plan)
  }
}
