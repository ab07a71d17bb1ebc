package graft

import org.apache.spark.sql.functions._
import graft.operators.Layout

/** q139 KMV sketch: the bucket-pruned bottom-k must equal the naive
  * per-type window definition exactly (the 4-hex-prefix pruning is a
  * scale shape, never a semantics change), the estimator must be the
  * closed form over the k-th smallest hash, and a type with fewer than
  * k distinct users must take the saturation rule (estimate == exact).
  */
class KmvSpec extends SparkSpec {

  test("bucket-pruned bottom-k matches the naive window and the closed-form estimator") {
    val out = Layout.queries("q139_kmv_distinct")(spark, Sf).collect()
    assert(out.nonEmpty)
    val ev = graft.sources.Tables.events(spark, Sf)
      .filter(col("user_id").isNotNull)
      .select(col("event_type"), md5(col("user_id").cast("string")).as("h"))
      .distinct()
    val naive = ev.withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_type")).orderBy(col("h"))))
      .filter(col("rn") <= 64)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_kept"), max(col("h")).as("hk"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getString(2))).toMap
    out.foreach { r =>
      val t = r.getAs[String]("event_type")
      val (nKept, hk) = naive(t)
      val est = r.getAs[Double]("kmv_estimate")
      val exact = r.getAs[Long]("n_distinct")
      if (nKept < 64) assert(est === exact.toDouble) // saturation rule
      else {
        val uk = java.lang.Long.parseLong(hk.substring(0, 12), 16) / 281474976710656.0
        assert(est === 63.0 / uk)
        // k=64 KMV has ~12.5% relative std error; 4x that is a hard bound
        assert(math.abs(r.getAs[Double]("rel_err")) < 0.5)
      }
    }
  }

  test("partial merge is associative and the sketch is partition-count invariant") {
    import graft.functions.KmvSketch
    import org.apache.spark.unsafe.types.UTF8String
    val agg = KmvSketch(
      org.apache.spark.sql.catalyst.expressions.Literal.create("x",
        org.apache.spark.sql.types.StringType), 8)
    val rng = new scala.util.Random(42)
    val hs = Seq.fill(100)(UTF8String.fromString(f"${rng.nextLong().abs}%016x"))
    def sk(xs: Seq[UTF8String]) = {
      val b = agg.createAggregationBuffer()
      xs.foreach { h => // same cap-insert path update() takes
        agg.merge(b, { val t = agg.createAggregationBuffer(); t.add(h.clone()); t })
      }
      b
    }
    val (a, b, c) = (sk(hs.slice(0, 30)), sk(hs.slice(30, 71)), sk(hs.slice(71, 100)))
    def copyOf(s: java.util.TreeSet[UTF8String]) = new java.util.TreeSet[UTF8String](s)
    val left = agg.merge(agg.merge(copyOf(a), copyOf(b)), copyOf(c))
    val right = agg.merge(copyOf(a), agg.merge(copyOf(b), copyOf(c)))
    val whole = sk(hs)
    assert(left.equals(right) && left.equals(whole))
    // round-trip through the partial-exchange wire format
    assert(agg.deserialize(agg.serialize(left)).equals(left))
    // partition-count invariance end-to-end: 1, 7, 32 input partitions
    // must produce byte-identical sketch rows
    import spark.implicits._
    val df = (1 to 5000).map(i => ("t" + i % 3, f"${(i * 2654435761L) % 100003}%032x")).toDF("g", "h")
    val runs = Seq(1, 7, 32).map { p =>
      df.repartition(p).groupBy($"g")
        .agg(graft.functions.KmvSketchAgg.kmv(spark, $"h", 64).as("s"))
        .select($"g", $"s.n_kept", $"s.hk").collect().map(_.toSeq).toSet
    }
    assert(runs(0) == runs(1) && runs(1) == runs(2))
  }

  test("plan pin: the sketch path shuffles O(tasks × groups) sketch rows, never the distinct set") {
    import spark.implicits._
    val ev = graft.sources.Tables.events(spark, Sf)
      .filter(col("user_id").isNotNull)
      .select(col("event_type"), md5(col("user_id").cast("string")).as("h"))
    val skDf = ev.groupBy(col("event_type"))
      .agg(graft.functions.KmvSketchAgg.kmv(spark, col("h"), 64).as("s"))
    skDf.collect()
    val plan = skDf.queryExecution.executedPlan
    assert(plan.toString.contains("ObjectHashAggregate"),
      "KMV must plan as an object-hash partial aggregate")
    // AQE nests exchanges inside materialized query stages — descend
    def collectShuffles(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.exchange.ShuffleExchangeLike] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        collectShuffles(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.ShuffleQueryStageExec =>
        Seq(q.shuffle)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        collectShuffles(q.plan) // stages are leaves; descend via .plan
      case other => other.children.flatMap(collectShuffles)
    }
    val shuffles = collectShuffles(plan)
    assert(shuffles.nonEmpty)
    val written = shuffles.map(_.metrics("shuffleRecordsWritten").value).sum
    val nTasks = shuffles.map(_.numMappers).sum
    val nTypes = ev.select(col("event_type")).distinct().count()
    assert(written <= nTasks.toLong * nTypes,
      s"sketch exchange carried $written rows; bound is tasks($nTasks) × groups($nTypes)")
    // and the bound is far under the distinct set the old plan shuffled
    val nDistinct = ev.distinct().count()
    assert(written < nDistinct / 10,
      s"sketch rows ($written) should be far under the distinct set ($nDistinct)")
  }

  test("q146: merging daily sketches equals sketching the raw window directly") {
    // the union property end-to-end: min-k over the union of per-day
    // kept sets == min-k over the raw window — so a sketch TABLE can
    // answer any rolling window without rescanning the source
    val out = Layout.queries("q146_kmv_rolling")(spark, Sf).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[java.sql.Date]("d").toString) ->
        r.getAs[Double]("kmv_estimate")).toMap
    assert(out.nonEmpty)
    val ev = graft.sources.Tables.events(spark, Sf)
      .filter(col("user_id").isNotNull)
      .select(col("event_type"), to_date(col("ts")).as("d"),
        md5(col("user_id").cast("string")).as("h")).distinct()
    val direct = ev.select(col("event_type"), col("d")).distinct().as("t")
      .join(ev.as("s"),
        col("t.event_type") === col("s.event_type") &&
        col("s.d").between(date_sub(col("t.d"), 6), col("t.d")))
      .select(col("t.event_type").as("event_type"), col("t.d").as("d"), col("s.h").as("h"))
      .distinct()
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_type"), col("d")).orderBy(col("h"))))
      .filter(col("rn") <= 64)
      .groupBy(col("event_type"), col("d"))
      .agg(count(lit(1)).as("n_kept"), max(col("h")).as("hk"))
      .collect()
    assert(direct.nonEmpty)
    direct.foreach { r =>
      val key = (r.getAs[String]("event_type"), r.getAs[java.sql.Date]("d").toString)
      val nKept = r.getAs[Long]("n_kept")
      val est =
        if (nKept < 64) nKept.toDouble
        else 63.0 / (java.lang.Long.parseLong(r.getAs[String]("hk").substring(0, 12), 16)
          / 281474976710656.0)
      assert(math.abs(out(key) - est) < 1e-9,
        s"$key: merged-sketch estimate ${out(key)} != direct $est")
    }
  }

  test("kmvFull output is the sorted distinct bottom-k set") {
    import spark.implicits._
    val df = (1 to 1000).map(i => ("g", f"${(i % 97) * 2654435761L}%032x")).toDF("g", "h")
    val ks = df.groupBy($"g")
      .agg(graft.functions.KmvSketchAgg.kmvFull(spark, $"h", 64).as("ks"))
      .collect()(0).getSeq[String](1)
    assert(ks.size == 64) // 97 distinct values, capped at k
    assert(ks == ks.sorted && ks.distinct.size == ks.size)
    val expected = (0 until 97).map(i => f"${i * 2654435761L}%032x").sorted.take(64)
    assert(ks == expected)
  }

  test("a type under k distinct users saturates to the exact count") {
    import spark.implicits._
    val dir = TempDirs.create("graft_kmv_small")
    // 40 distinct users (< k=64) over one type, plus a 200-user type
    val rows =
      (1 to 500).map(i => (i.toLong, 1700000000000000000L + i * 1000L, (i % 40 + 1).toLong, "tiny", 1.0)) ++
      (501 to 1500).map(i => (i.toLong, 1700000000000000000L + i * 1000L, (i % 200 + 1000).toLong, "big", 1.0))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$dir/events.parquet")
    val out = Layout.queries("q139_kmv_distinct")(spark, dir)
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    assert(out("tiny").getAs[Double]("kmv_estimate") === 40.0)
    assert(out("tiny").getAs[Double]("rel_err") === 0.0)
    assert(out("big").getAs[Long]("n_distinct") === 200L)
    assert(out("big").getAs[Double]("kmv_estimate") !== 200.0) // estimator path
  }
}
