package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Bench-only skewed-corpus builder for the q136 blocking-key stress
  * measurements (PLANS §r7/§r8): copies `<srcDir>/documents.parquet` to
  * `<outDir>/documents.parquet` with `prefix` prepended to every doc
  * whose `doc_id` is even — 50% of the corpus collapses into ONE
  * first-token block (prefix "the "), or one first-TWO-token block
  * (prefix "the quick "), the boilerplate-prefix shape scraped corpora
  * actually have. Deterministic (id parity, no RNG) so a rebuild is
  * byte-identical and cross-engine checks can re-derive it in SQL.
  *
  * Usage: runMain graft.SkewCorpus <srcDir> <outDir> <prefix>
  */
object SkewCorpus {
  def main(args: Array[String]): Unit = {
    val Array(srcDir, outDir, prefix) = args
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$srcDir/documents.parquet")
      .withColumn("text",
        when(col("doc_id") % 2 === 0, concat(lit(prefix), col("text")))
          .otherwise(col("text")))
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    val n = spark.read.parquet(s"$outDir/documents.parquet").count()
    println(s"[skewcorpus] $outDir/documents.parquet: $n docs, prefix '$prefix' on even ids")
    spark.stop()
  }
}
