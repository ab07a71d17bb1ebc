package graft

import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** q138 epoch assembly: per-source budgets are exact floor arithmetic
  * over integral weights, admission is greedy-with-overflow in md5
  * order, and the two-phase bucketed cumsum must agree with the naive
  * single-window definition exactly (the scale shape is an
  * implementation detail, never a semantics change).
  */
class TokenBudgetSpec extends SparkSpec {

  test("budgets are bg*w div sw and admission fills each budget with overflow < one doc") {
    val rows = TextOps.queries("q138_token_budget")(spark, Sf).collect()
    assert(rows.nonEmpty)
    val tot = rows.map(_.getAs[Long]("tot_tokens")).sum
    val bg = tot / 2
    val sw = rows.map(_.getAs[Long]("weight")).sum
    rows.foreach { r =>
      val w = r.getAs[Long]("weight")
      assert(r.getAs[Long]("budget_tokens") === (BigInt(bg) * w / sw).toLong)
      val kept = r.getAs[Long]("tokens_kept")
      val budget = r.getAs[Long]("budget_tokens")
      val totS = r.getAs[Long]("tot_tokens")
      // a source with enough tokens fills its budget (overflow allowed:
      // the straddling doc carries its tokens); a short source keeps all
      if (totS >= budget) assert(kept >= budget) else assert(kept === totS)
      assert(kept <= totS)
    }
  }

  test("bucketed two-phase cumsum equals the naive per-source window exactly") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
      .select(col("source"), col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"),
        md5(col("doc_id").cast("string")).as("h"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("h"), col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val naive = docs.withColumn("start", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
    val out = TextOps.queries("q138_token_budget")(spark, Sf)
      .select(col("source"), col("budget_tokens"), col("n_docs_kept"), col("tokens_kept"))
    val check = naive.join(out, "source")
      .filter(col("start") < col("budget_tokens"))
      .groupBy(col("source"), col("n_docs_kept"), col("tokens_kept"))
      .agg(count(lit(1)).as("naive_docs"), sum(col("n_tokens")).as("naive_tokens"))
      .collect()
    assert(check.nonEmpty)
    check.foreach { r =>
      assert(r.getAs[Long]("naive_docs") === r.getAs[Long]("n_docs_kept"))
      assert(r.getAs[Long]("naive_tokens") === r.getAs[Long]("tokens_kept"))
    }
  }

  test("deterministic across reruns") {
    val a = TextOps.queries("q138_token_budget")(spark, Sf).collect().toSeq
    val b = TextOps.queries("q138_token_budget")(spark, Sf).collect().toSeq
    assert(a === b)
  }
}
