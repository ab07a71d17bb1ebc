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

  test("metadata queries do not require payload decode (column pruning)") {
    val plan = MultimodalOps.mediaTable(spark, Sf)
      .select("doc_id", "media_type", "width")
      .queryExecution.executedPlan.toString
    // the parquet scan must not read the text column backing the payload
    assert(plan.contains("ReadSchema") && !plan.contains("text"), plan)
  }
}
