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

  test("q156 rate-sampling: same budgets as q138, naive predicate parity, calibrated") {
    val sf01 = "/root/testdata/sf0.01"
    val q138 = TextOps.queries("q138_token_budget")(spark, sf01).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("budget_tokens")).toMap
    val out = TextOps.queries("q156_epoch_sample")(spark, sf01).collect()
    assert(out.length === q138.size)
    // naive recomputation of the inclusion set
    val docs = graft.sources.Tables.documents(spark, sf01)
      .withColumn("w", size(split(trim(col("text")), "\\s+")).cast("long"))
      .withColumn("h48",
        expr("CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 12), 16, 10) AS BIGINT)"))
      .collect().map(r => (r.getAs[String]("source"), r.getAs[Long]("w"), r.getAs[Long]("h48")))
    val tots = docs.groupBy(_._1).map { case (s, ds) => s -> ds.map(_._2).sum }
    out.foreach { r =>
      val src = r.getAs[String]("source")
      // the two assembly strategies must share the identical budget table
      assert(r.getAs[Long]("budget_tokens") === q138(src))
      val b = BigInt(r.getAs[Long]("budget_tokens"))
      val tot = BigInt(tots(src))
      val naive = docs.filter(_._1 == src).filter { case (_, _, h48) =>
        b >= tot || BigInt(h48) * tot < b * BigInt(281474976710656L) }
      assert(r.getAs[Long]("n_docs_kept") === naive.length.toLong)
      assert(r.getAs[Long]("tokens_kept") === naive.map(_._2).sum)
      // E[tokens_kept] == budget: with ~250 docs/source the binomial
      // spread is wide but fill must stay in a sane band
      assert(r.getAs[Double]("fill_ratio") > 0.3 &&
        r.getAs[Double]("fill_ratio") < 2.5, s"$src fill ${r.getAs[Double]("fill_ratio")}")
      // HT identity: est == kept * tot / min(budget, tot)
      val ht = r.getAs[Double]("ht_total_est")
      val expect = r.getAs[Long]("tokens_kept").toDouble * tot.toDouble /
        math.min(b.toDouble, tot.toDouble)
      assert(ht === expect)
    }
    // global calibration: summed kept tokens near the summed budget
    val keptSum = out.map(_.getAs[Long]("tokens_kept")).sum.toDouble
    val budgetSum = out.map(_.getAs[Long]("budget_tokens")).sum.toDouble
    assert(math.abs(keptSum / budgetSum - 1.0) < 0.25,
      s"global fill ${keptSum / budgetSum}")
  }
}
