package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** End-to-end training-corpus curation — the LLM-data analogue of the
  * weather bronze→silver→gold pipeline (`weather/Pipeline`), composing
  * the operators that are individually oracled as q70–q78:
  *
  *   raw documents
  *     → quality gate (token count + punct ratio, q72's thresholds)
  *     → exact dedup (lowest doc_id per content hash)
  *     → deterministic train/val/test assignment (q71's hash split)
  *     → α=0.5 source mixing inside train only (q78's keep rule —
  *       eval sets are never downsampled)
  *     → curated table written partitioned by `split` + per-source
  *       yield report.
  *
  * Everything is a pure function of document content and id, so the run
  * is deterministic and the overwrite idempotent (CorpusPipelineSpec
  * runs it twice and diffs). Scale: two shuffles total — the dedup
  * window on md5(text) and the report aggregate; split/mix are row-local;
  * the write partitions by `split` so training readers never list eval
  * files.
  */
object CorpusPipeline {

  final case class Layers(base: String) {
    val curated = s"$base/corpus_curated"
    val report = s"$base/corpus_report"
  }

  def curate(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    // quality gate (q72 thresholds)
    val base = docs
      .withColumn("n_toks", size(split(trim(col("text")), "\\s+")))
      .withColumn("n_punct",
        length(regexp_replace(col("text"), "[A-Za-z0-9\\s]", "")))
      .filter(col("n_toks") >= 5 &&
        col("n_punct").cast("double") / col("n_chars") < 0.2)
    // exact dedup: keep lowest doc_id per content hash
    val keepers = base
      .withColumn("__rn", row_number().over(
        Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))))
      .filter(col("__rn") === 1).drop("__rn")
    // split assignment (q71)
    val h = substring(md5(col("doc_id").cast("string")), 1, 2)
    val split3 = keepers.withColumn("split",
      when(h < "cc", "train").when(h < "e6", "val").otherwise("test"))
    // α=0.5 source mixing, train only (q78 keep rule on a second hash
    // window so mixing is independent of the split assignment)
    val counts = split3.filter(col("split") === "train")
      .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    val minN = counts.agg(min(col("n_docs")).as("min_n"))
    val frac = counts.crossJoin(broadcast(minN))
      .select(col("source"),
        lpad(lower(hex(floor(
          least(lit(1.0), sqrt(col("min_n").cast("double") * col("n_docs")) / col("n_docs"))
            * 4294967296.0).cast("long"))), 9, "0").as("thresh_hex"))
    split3.join(broadcast(frac), Seq("source"), "left")
      .filter(col("split") =!= "train" ||
        lpad(substring(md5(concat(lit("mix|"), col("doc_id").cast("string"))), 1, 8), 9, "0")
          < col("thresh_hex"))
      .select(col("doc_id"), col("source"), col("lang"), col("n_chars"),
        col("text"), col("split"))
  }

  /** Run the full curation and persist both layers; returns the layout. */
  def run(spark: SparkSession, dir: String, out: String): Layers = {
    val layers = Layers(out)
    val curated = curate(spark, dir)
    curated.write.mode(SaveMode.Overwrite).partitionBy("split").parquet(layers.curated)
    spark.read.parquet(layers.curated)
      .groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars_total"))
      // coalesce(1) is safe ONLY because this is the per-(source,split)
      // yield report — dozens of rows post-aggregation. Never copy this
      // onto a data-sized write; the curated layer above stays partitioned.
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(layers.report)
    layers
  }
}
