package graft

import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** q144 leakage-safe split: the structural guarantee is that a verified
  * near-dup pair NEVER spans the train/val/test boundary — the whole
  * reason to key the md5 split by the dedup-cluster representative
  * instead of the doc. The fixture pins the interesting case: doc 1
  * hashes to 'train' and its exact clone doc 3 hashes to 'test' under
  * q71's per-doc rule (md5("3") = 'ec…' ≥ 'e6'), so a per-doc split
  * WOULD contaminate; the cluster key (min doc_id = 1) puts both in
  * 'train'.
  */
class LeakageSplitSpec extends SparkSpec {

  test("clone pairs that straddle the per-doc boundary land together") {
    import spark.implicits._
    val dir = TempDirs.create("graft_leakage")
    val clone = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val docs = Seq(
      (1L, clone, "en", "web", 60L),   // md5("1") = 'c4' -> train per-doc
      (3L, clone, "en", "web", 60L),   // md5("3") = 'ec' -> test per-doc
      (2L, "wholly unrelated words here about completely different topics " +
        "covering nothing shared with the clone pair at all in any way",
        "en", "web", 60L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    val asn = TextOps.leakageSafeAssignments(spark, dir)
      .select(col("doc_id"), col("ck"), col("split")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    // the clone pair shares a cluster key (the component minimum)...
    assert(asn(1L)._1 === 1L && asn(3L)._1 === 1L)
    // ...and therefore a split — 'train', because md5("1") < 'cc'
    assert(asn(1L)._2 === "train" && asn(3L)._2 === "train")
    // the unrelated doc keys by itself
    assert(asn(2L)._1 === 2L)
  }

  test("gate scale: no verified pair spans splits; per-doc split WOULD leak") {
    val asn = TextOps.leakageSafeAssignments(spark, Sf)
      .select(col("doc_id"), col("split"),
        // what q71's per-doc rule would have said, for the contrast claim
        when(substring(md5(col("doc_id").cast("string")), 1, 2) < "cc", "train")
          .when(substring(md5(col("doc_id").cast("string")), 1, 2) < "e6", "val")
          .otherwise("test").as("doc_split"))
    val pairs = TextOps.q45MinhashLsh(spark, Sf).select(col("doc_a"), col("doc_b"))
    val joined = pairs
      .join(asn.select(col("doc_id").as("doc_a"), col("split").as("sa"),
        col("doc_split").as("da")), Seq("doc_a"))
      .join(asn.select(col("doc_id").as("doc_b"), col("split").as("sb"),
        col("doc_split").as("db")), Seq("doc_b"))
      .select(col("sa"), col("sb"), col("da"), col("db")).collect()
    assert(joined.nonEmpty, "gate corpus should have verified pairs")
    // the guarantee: zero pairs span splits under the cluster key
    assert(joined.forall(r => r.getString(0) == r.getString(1)))
    // the contrast: the per-doc rule is only safe by luck; if any pair
    // straddles under it, the cluster key must have repaired exactly that
    val wouldLeak = joined.count(r => r.getString(2) != r.getString(3))
    info(s"per-doc rule would have split $wouldLeak verified pair(s) across sets")
  }
}
