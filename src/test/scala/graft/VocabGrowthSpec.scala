package graft

import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** q155 vocabulary growth: the one-pass min-bucket construction must
  * equal the naive definition (for every prefix p, vocab_cum(p) ==
  * |distinct tokens over buckets ≤ p|), and the final row must be the
  * whole-corpus census.
  */
class VocabGrowthSpec extends SparkSpec {

  test("one-pass min-bucket growth curve equals the naive per-prefix distinct") {
    val out = TextOps.queries("q155_vocab_growth")(spark, Sf).collect()
    assert(out.length === 8)
    val toks = graft.sources.Tables.documents(spark, Sf)
      .withColumn("bucket",
        expr("CAST(CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 2), 16, 10) AS INT) div 32 + 1 AS INT)"))
      .select(col("bucket"),
        explode(split(trim(lower(col("text"))), "\\s+")).as("tok"))
      .filter(col("tok") =!= "")
      .collect().map(r => (r.getInt(0), r.getString(1)))
    out.foreach { r =>
      val p = r.getAs[Int]("bucket")
      val upTo = toks.filter(_._1 <= p)
      assert(r.getAs[Long]("n_tokens_cum") === upTo.length.toLong)
      assert(r.getAs[Long]("vocab_cum") === upTo.map(_._2).distinct.length.toLong,
        s"vocab_cum mismatch at prefix $p")
    }
    // census coherence: new_types partitions the vocabulary
    assert(out.map(_.getAs[Long]("new_types")).sum ===
      toks.map(_._2).distinct.length.toLong)
    // growth curve is monotone and the ratio well-formed
    val vc = out.map(_.getAs[Long]("vocab_cum"))
    assert(vc.zip(vc.tail).forall { case (a, b) => a <= b })
    out.foreach(r => assert(r.getAs[Double]("type_token_ratio") > 0.0))
  }
}
