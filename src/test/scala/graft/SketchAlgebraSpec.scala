package graft

import org.apache.spark.sql.functions._
import graft.operators.Layout

/** q148 (KMV set algebra) + q149 (priority sampling).
  *
  * q148's load-bearing law: the union sketch computed FROM the two
  * per-type kept sets must equal the union sketch computed from the raw
  * distinct hashes (so set algebra never needs the source), and the
  * match count must be the literal |merged ∩ kept_a ∩ kept_b|.
  * Saturated pairs (sf0.001: 15 users/type) must degrade to exact;
  * unsaturated pairs (sf0.01: 150 users/type) must stay inside the
  * k = 64 estimator's error bars.
  *
  * q149's contract: the bounded top-k aggregate must reproduce the
  * window-rank definition EXACTLY (same sample, same order) at any
  * partition count, and the τ-threshold estimator must satisfy
  * Σ max(w_i, τ) computed order-independently. Saturated groups
  * (n_docs ≤ k) are exact with τ = 0.
  */
class SketchAlgebraSpec extends SparkSpec {

  private val Sf01 = "/root/testdata/sf0.01"

  // ---- q148 ----------------------------------------------------------

  test("q148: sketch-side union/match algebra equals the raw-data definition") {
    val out = Layout.queries("q148_kmv_algebra")(spark, Sf01).collect()
    assert(out.length > 1)
    val dh = graft.sources.Tables.events(spark, Sf01)
      .filter(col("user_id").isNotNull)
      .select(col("event_type"), md5(col("user_id").cast("string")).as("h"))
      .distinct().collect()
      .groupBy(_.getString(0)).map { case (t, rs) => t -> rs.map(_.getString(1)).toSet }
    out.foreach { r =>
      val (ta, tb) = (r.getAs[String]("type_a"), r.getAs[String]("type_b"))
      val (ha, hb) = (dh(ta), dh(tb))
      val keptA = ha.toSeq.sorted.take(64).toSet
      val keptB = hb.toSeq.sorted.take(64).toSet
      // union sketch from kept sets == union sketch from raw hashes
      val mergedFromKept = (keptA ++ keptB).toSeq.sorted.take(64)
      val mergedFromRaw = (ha ++ hb).toSeq.sorted.take(64)
      assert(mergedFromKept === mergedFromRaw,
        s"($ta,$tb): kept-set union sketch diverges from raw union sketch")
      assert(r.getAs[Long]("n_kept") === mergedFromKept.length.toLong)
      val matches = mergedFromKept.count(h => keptA(h) && keptB(h)).toLong
      assert(r.getAs[Long]("matches") === matches)
      // exact anchors
      assert(r.getAs[Long]("n_inter") === (ha intersect hb).size.toLong)
      assert(r.getAs[Long]("n_union") === (ha union hb).size.toLong)
    }
  }

  test("q148: saturated pairs are exact; unsaturated pairs stay in the error bars") {
    // sf0.001: 15 distinct users per type -> every pair saturated
    val sat = Layout.queries("q148_kmv_algebra")(spark, Sf).collect()
    assert(sat.nonEmpty)
    sat.foreach { r =>
      assert(r.getAs[Long]("n_kept") < 64L)
      assert(r.getAs[Double]("union_est") === r.getAs[Long]("n_union").toDouble)
      assert(r.getAs[Double]("jaccard_est") === r.getAs[Double]("jaccard_exact"))
      assert(math.abs(r.getAs[Double]("inter_est") - r.getAs[Long]("n_inter")) < 1e-9)
    }
    // sf0.01: 150 users/type -> merged sketches saturate at k = 64;
    // k = 64 bottom-k has ~12.5% relative std error on the union and
    // binomial ~sqrt(J(1-J)/64) <= 0.063 absolute on the match fraction;
    // 4-5 sigma bounds make flakiness impossible without masking defects
    val uns = Layout.queries("q148_kmv_algebra")(spark, Sf01).collect()
      .filter(_.getAs[Long]("n_kept") === 64L)
    assert(uns.nonEmpty, "sf0.01 must exercise the unsaturated estimator path")
    uns.foreach { r =>
      assert(math.abs(r.getAs[Double]("union_rel_err")) < 0.5)
      assert(math.abs(r.getAs[Double]("jaccard_est") - r.getAs[Double]("jaccard_exact")) < 0.3)
    }
  }

  test("q157: join-size estimate — saturated pairs exact, estimator coherent") {
    // sf0.001: 15 users/type -> merged sketches unsaturated -> EXACT
    Layout.queries("q157_join_size_est")(spark, Sf).collect().foreach { r =>
      assert(r.getAs[Long]("n_kept") < 64L)
      assert(math.abs(r.getAs[Double]("join_est")
        - r.getAs[Long]("n_join_exact").toDouble) < 1e-6,
        s"saturated pair must estimate exactly: ${r}")
    }
    // sf0.01: 150 users/type -> real estimator path; recompute psum
    // and matches from the raw frequencies
    val out = Layout.queries("q157_join_size_est")(spark, Sf01).collect()
    assert(out.exists(_.getAs[Long]("n_kept") === 64L))
    val freq = graft.sources.Tables.events(spark, Sf01)
      .filter(col("user_id").isNotNull)
      .select(col("event_type"), md5(col("user_id").cast("string")).as("h"))
      .groupBy("event_type", "h").count().collect()
      .groupBy(_.getString(0))
      .map { case (t, rs) => t -> rs.map(r => r.getString(1) -> r.getLong(2)).toMap }
    out.foreach { r =>
      val (ta, tb) = (r.getAs[String]("type_a"), r.getAs[String]("type_b"))
      val (fa, fb) = (freq(ta), freq(tb))
      val keptA = fa.keySet.toSeq.sorted.take(64).toSet
      val keptB = fb.keySet.toSeq.sorted.take(64).toSet
      val merged = (keptA ++ keptB).toSeq.sorted.take(64)
      val matched = merged.filter(h => keptA(h) && keptB(h))
      assert(r.getAs[Long]("matches") === matched.length.toLong)
      assert(r.getAs[Long]("psum") === matched.map(h => fa(h) * fb(h)).sum)
      val exact = (fa.keySet intersect fb.keySet).toSeq.map(h => fa(h) * fb(h)).sum
      assert(r.getAs[Long]("n_join_exact") === exact)
      // k=64 sampling: generous 5-sigma-ish band on the relative error
      assert(math.abs(r.getAs[Double]("rel_err")) < 0.8, s"($ta,$tb): ${r}")
    }
  }

  // ---- q149 ----------------------------------------------------------

  test("q149: bounded top-k aggregate reproduces the window-rank sample exactly") {
    val out = Layout.queries("q149_priority_sample")(spark, Sf01).collect()
    assert(out.nonEmpty)
    // naive window definition, computed independently
    val docs = graft.sources.Tables.documents(spark, Sf01)
      .withColumn("w", size(split(trim(col("text")), "\\s+")).cast("long"))
      .withColumn("h48",
        expr("CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 12), 16, 10) AS BIGINT)"))
      .withColumn("priority",
        col("w").cast("double") * lit(281474976710656.0)
          / (col("h48") + lit(1L)).cast("double"))
    val naive = docs.withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("source"))
          .orderBy(col("priority").desc, col("doc_id").cast("string"))))
      .filter(col("rnk") <= 16)
      .select(col("source"), col("rnk"), col("doc_id"), col("w"))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3))).toMap
    out.foreach { r =>
      val key = (r.getAs[String]("source"), r.getAs[Int]("rnk"))
      assert(naive(key) === ((r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"))),
        s"sample mismatch at $key")
    }
    // tau is the 17th priority; estimator identity Σ max(w, τ) holds
    val tau = docs.withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("source"))
          .orderBy(col("priority").desc, col("doc_id").cast("string"))))
      .filter(col("rnk") === 17)
      .select(col("source"), col("priority")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    out.groupBy(_.getAs[String]("source")).foreach { case (src, rows) =>
      assert(rows.head.getAs[Double]("tau") === tau.getOrElse(src, 0.0))
      val t = rows.head.getAs[Double]("tau")
      val est = rows.map(r => math.max(r.getAs[Long]("n_tokens").toDouble, t)).sum
      // spec-side sum order can differ by ulps from the engine's
      // order-independent Σ_{w≥τ} w + τ·n_small form
      assert(math.abs(est - rows.head.getAs[Double]("est_total_tokens"))
        <= math.ulp(est) * 64)
    }
  }

  test("q149: sample is partition-count invariant (merge correctness)") {
    import spark.implicits._
    val df = (1 to 3000)
      .map(i => ("g" + i % 3, s"id$i", 1L + i % 97,
        (1.0 + i % 97) * 281474976710656.0 / (1 + (i * 2654435761L) % 100003)))
      .toDF("g", "id", "w", "p")
    val runs = Seq(1, 7, 32).map { np =>
      df.repartition(np).groupBy($"g")
        .agg(graft.functions.PrioritySampleAgg.prioritySample(
          spark, $"id", $"w", $"p", 17).as("top"))
        .select($"g", $"top").collect()
        .map(r => r.getString(0) -> r.getSeq[org.apache.spark.sql.Row](1).map(_.toSeq))
        .toMap
    }
    assert(runs(0) == runs(1) && runs(1) == runs(2))
    // wire round-trip of the partial buffer
    val agg = graft.functions.PrioritySample(
      org.apache.spark.sql.catalyst.expressions.Literal.create("x",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.catalyst.expressions.Literal.create(1L,
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.catalyst.expressions.Literal.create(1.0,
        org.apache.spark.sql.types.DoubleType), 8)
    val buf = agg.createAggregationBuffer()
    (1 to 50).foreach { i =>
      val other = agg.createAggregationBuffer()
      other.add((i * 7.5, org.apache.spark.unsafe.types.UTF8String.fromString(s"d$i"), i.toLong))
      agg.merge(buf, other)
    }
    assert(buf.size === 8)
    assert(agg.deserialize(agg.serialize(buf)).equals(buf))
  }

  test("q149: repeated items never shrink the sample below k (duplicate eviction guard)") {
    import spark.implicits._
    // 20 distinct items, each repeated 5x with identical (priority, item,
    // w): the buggy cap path admitted the duplicate as a no-op but still
    // evicted the k-th element, shrinking the sample
    val df = (1 to 100)
      .map { i => val v = 1 + (i - 1) % 20; ("g", s"id$v", v.toLong, v.toDouble) }
      .toDF("g", "id", "w", "p").repartition(7)
    val top = df.groupBy($"g")
      .agg(graft.functions.PrioritySampleAgg.prioritySample(
        spark, $"id", $"w", $"p", 8).as("top"))
      .select($"top").collect().head.getSeq[org.apache.spark.sql.Row](0)
    assert(top.length === 8, s"sample shrank to ${top.length}")
    assert(top.map(_.getString(0)) === (20 to 13 by -1).map(v => s"id$v"))
  }

  test("q149: saturated groups (n_docs <= k) are exact with tau = 0") {
    import spark.implicits._
    val dir = TempDirs.create("graft_psample")
    (1L to 9L).map(i => (i, Seq.fill(i.toInt)("tok").mkString(" "), "en", "tiny", 3L * i))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = Layout.queries("q149_priority_sample")(spark, dir).collect()
    assert(out.length === 9) // every doc sampled
    out.foreach { r =>
      assert(r.getAs[Double]("tau") === 0.0)
      assert(r.getAs[Double]("est_total_tokens") === 45.0) // 1+..+9, exact
      assert(r.getAs[Double]("rel_err") === 0.0)
    }
  }

  test("q154: threshold sample == the naive inclusion predicate, estimator coherent") {
    val out = Layout.queries("q154_threshold_sample")(spark, Sf01).collect()
    assert(out.nonEmpty)
    val docs = graft.sources.Tables.documents(spark, Sf01)
      .withColumn("w", size(split(trim(col("text")), "\\s+")).cast("long"))
      .withColumn("h48",
        expr("CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 12), 16, 10) AS BIGINT)"))
      .collect().map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("w"), r.getAs[Long]("h48")))
    val totals = docs.groupBy(_._1).map { case (s, ds) => s -> ds.map(_._3).sum }
    val expected = docs.filter { case (s, _, w, h48) =>
      val tau = totals(s).toDouble / 24.0
      w.toDouble * 281474976710656.0 > tau * (h48 + 1).toDouble
    }.map(d => (d._1, d._2)).toSet
    assert(out.map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"))).toSet
      === expected, "sample must be exactly the inclusion-predicate set")
    // per-source: estimator identity and sane expected size
    out.groupBy(_.getAs[String]("source")).foreach { case (src, rows) =>
      val tau = rows.head.getAs[Double]("tau")
      assert(rows.head.getAs[Long]("n_sampled") === rows.length.toLong)
      val est = rows.map(r => math.max(r.getAs[Long]("n_tokens").toDouble, tau)).sum
      assert(math.abs(est - rows.head.getAs[Double]("est_total_tokens"))
        <= math.ulp(est) * 64)
      // expected size 24 of 250 docs; 5x-sigma bounds
      assert(rows.length >= 5 && rows.length <= 60, s"$src sampled ${rows.length}")
      assert(math.abs(rows.head.getAs[Double]("rel_err")) < 0.8)
    }
  }

  test("q149: plan pin — object-hash partial aggregate, no per-source sort") {
    val docs = graft.sources.Tables.documents(spark, Sf)
      .withColumn("w", size(split(trim(col("text")), "\\s+")).cast("long"))
      .withColumn("p", col("w").cast("double"))
    val agg = docs.groupBy(col("source"))
      .agg(graft.functions.PrioritySampleAgg.prioritySample(
        spark, col("doc_id").cast("string"), col("w"), col("p"), 17).as("top"))
    agg.collect()
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"),
      "priority sample must plan as an object-hash partial aggregate")
    assert(!plan.contains("Window"), "no window/rank may appear in the sample path")
  }
}
