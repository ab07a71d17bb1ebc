package graft

import org.apache.spark.sql.functions._

/** [[graft.functions.KmvFreqSketch]] — the frequency-carrying KMV
  * (fourth bounded aggregate on the house contract): kept set ==
  * bottom-k distinct hashes, each with its EXACT total weight. Pins the
  * naive-definition equality, the exactness-by-downward-closure of the
  * counts, weighted-merge associativity + wire round-trip, partition
  * invariance, the two-tier law (daily partials merged with stored
  * counts as weights == one direct corpus sketch — what
  * `KmvTable`'s key-tier bundle and q166 rely on), and the plan shape.
  */
class KmvFreqSpec extends SparkSpec {

  test("kept set is the bottom-k with exact per-hash counts") {
    import spark.implicits._
    // 97 distinct hash values with frequency i+1 for value i
    val rows = (0 until 97).flatMap(i =>
      Seq.fill(i + 1)(("g", f"${i * 2654435761L}%032x")))
    val df = rows.toDF("g", "h").repartition(13)
    val out = df.groupBy($"g")
      .agg(graft.functions.KmvFreqAgg.kmvFreq(spark, $"h", lit(1L), 64).as("ksf"))
      .collect()(0).getSeq[org.apache.spark.sql.Row](1)
      .map(r => r.getString(0) -> r.getLong(1))
    assert(out.size === 64)
    assert(out.map(_._1) == out.map(_._1).sorted)
    val expected = (0 until 97)
      .map(i => f"${i * 2654435761L}%032x" -> (i + 1).toLong)
      .sortBy(_._1).take(64)
    assert(out.toSeq === expected, "counts must be exact, not sampled")
  }

  test("weighted merge is associative, wire-stable, partition-invariant") {
    import graft.functions.KmvFreqSketch
    import org.apache.spark.unsafe.types.UTF8String
    val agg = KmvFreqSketch(
      org.apache.spark.sql.catalyst.expressions.Literal.create("x",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.catalyst.expressions.Literal.create(1L,
        org.apache.spark.sql.types.LongType), 8)
    val rng = new scala.util.Random(7)
    // 40 distinct hashes, each appearing 1-5 times across the stream
    val hs = Seq.fill(40)(UTF8String.fromString(f"${rng.nextLong().abs}%016x"))
      .flatMap(h => Seq.fill(1 + rng.nextInt(5))(h))
    val shuffled = rng.shuffle(hs)
    def sk(xs: Seq[UTF8String]) = {
      val b = agg.createAggregationBuffer()
      xs.foreach { h =>
        agg.merge(b, {
          val t = agg.createAggregationBuffer(); t.put(h.clone(), 1L); t })
      }
      b
    }
    def copyOf(m: java.util.TreeMap[UTF8String, Long]) =
      new java.util.TreeMap[UTF8String, Long](m)
    val (a, b, c) =
      (sk(shuffled.slice(0, 50)), sk(shuffled.slice(50, 120)),
        sk(shuffled.slice(120, shuffled.size)))
    val left = agg.merge(agg.merge(copyOf(a), copyOf(b)), copyOf(c))
    val right = agg.merge(copyOf(a), agg.merge(copyOf(b), copyOf(c)))
    val whole = sk(shuffled)
    assert(left.equals(right) && left.equals(whole))
    // counts in the kept set are the true multiplicities
    val truth = shuffled.groupBy(identity).map { case (h, xs) => h -> xs.size.toLong }
    left.forEach { (h, c) => assert(c === truth(h), s"count for $h") }
    assert(agg.deserialize(agg.serialize(left)).equals(left))
    // partition invariance end-to-end
    import spark.implicits._
    val df = (1 to 5000).map(i =>
      ("t" + i % 3, f"${(i % 211) * 2654435761L}%032x")).toDF("g", "h")
    val runs = Seq(1, 7, 32).map { p =>
      df.repartition(p).groupBy($"g")
        .agg(graft.functions.KmvFreqAgg.kmvFreq(spark, $"h", lit(1L), 64).as("s"))
        .select($"g", $"s").collect()
        .map(r => (r.getString(0), r.getSeq[org.apache.spark.sql.Row](1)
          .map(x => (x.getString(0), x.getLong(1))).toList)).toSet
    }
    assert(runs(0) == runs(1) && runs(1) == runs(2))
  }

  test("two tiers compose: partials merged by stored count == direct sketch") {
    // the KmvTable key-bundle law: sketch per day with weight 1, then
    // merge the stored (h, c) partials with c as the weight — the
    // result must equal sketching the whole corpus directly (counts
    // exact by downward-closure)
    import spark.implicits._
    val rows = (1 to 4000).map { i =>
      (s"d${i % 5}", "g", f"${(i % 300) * 2654435761L}%032x") }
    val df = rows.toDF("d", "g", "h")
    val daily = df.groupBy($"d", $"g")
      .agg(graft.functions.KmvFreqAgg.kmvFreq(spark, $"h", lit(1L), 64).as("ksf"))
    val merged = daily.select($"g", expr("inline(ksf)"))
      .groupBy($"g")
      .agg(graft.functions.KmvFreqAgg.kmvFreq(spark, $"h", $"c", 64).as("ksf"))
      .collect()(0).getSeq[org.apache.spark.sql.Row](1)
      .map(r => (r.getString(0), r.getLong(1)))
    val direct = df.groupBy($"g")
      .agg(graft.functions.KmvFreqAgg.kmvFreq(spark, $"h", lit(1L), 64).as("ksf"))
      .collect()(0).getSeq[org.apache.spark.sql.Row](1)
      .map(r => (r.getString(0), r.getLong(1)))
    assert(merged === direct)
    // and against ground truth
    val truth = rows.groupBy(_._3).map { case (h, xs) => h -> xs.size.toLong }
    merged.foreach { case (h, c) => assert(c === truth(h)) }
  }

  test("drip-fed streamed kept set == batch bottom-k WITH counts; state rows == groups") {
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    import graft.streaming.EventsStream
    val s = spark
    val base = TempDirs.create("graft_stream_kf")
    val feedDir = s"$base/feed"
    val raw = graft.sources.Tables.eventsRawNanos(s, Sf)
      .withColumn("__t", ntile(4).over(
        org.apache.spark.sql.expressions.Window.orderBy(col("ts"), col("event_id"))))
    for (i <- 1 to 4)
      EventsStream.landFeedFile(
        raw.filter(col("__t") === i).drop("__t"), feedDir, f"tranche$i%03d")
    val feed = s.readStream.schema(EventsStream.eventsSchema)
      .option("maxFilesPerTrigger", "1").parquet(feedDir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val q = EventsStream.kmvFreqWindowAgg(s, feed).writeStream
      .outputMode(OutputMode.Complete)
      .format("memory").queryName("stream_kf_spec")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val progress = q.recentProgress.toSeq
    assert(progress.count(_.numInputRows > 0) >= 4,
      "the run must actually span multiple data micro-batches")
    val streamed = s.table("stream_kf_spec").collect()
      .map(r => (r.getAs[java.sql.Timestamp]("window_start"),
        r.getAs[String]("event_type")) ->
        r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("ksf"))
          .map(x => (x.getString(0), x.getLong(1))).toList).toMap
    // batch definition: bottom-64 distinct hashes per group with EXACT
    // per-hash counts — the frequencies must survive arbitrary
    // micro-batch splits (counts ADD across batches, downward-closure)
    val batch = graft.sources.Tables.events(s, Sf)
      .filter(col("user_id").isNotNull)
      .select(date_trunc("hour", col("ts")).as("w"), col("event_type"),
        md5(col("user_id").cast("string")).as("h"))
      .groupBy(col("w"), col("event_type"), col("h"))
      .agg(count(lit(1)).as("c"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("w"), col("event_type")).orderBy(col("h"))))
      .filter(col("rn") <= 64)
      .orderBy(col("w"), col("event_type"), col("h"))
      .collect().groupBy(r => (r.getAs[java.sql.Timestamp]("w"),
        r.getAs[String]("event_type")))
      .map { case (k, rs) =>
        k -> rs.map(r => (r.getAs[String]("h"), r.getAs[Long]("c"))).toList }
    assert(streamed === batch,
      "micro-batch boundaries must be invisible in kept hashes AND counts")
    val stateRows = progress.flatMap(_.stateOperators.headOption)
      .map(_.numRowsTotal).max
    assert(stateRows === batch.size.toLong,
      s"state must be one synopsis row per group: $stateRows vs ${batch.size}")
  }

  test("plan pin: object-hash partial aggregate, O(tasks × groups) exchange") {
    val ev = graft.sources.Tables.events(spark, Sf)
      .filter(col("user_id").isNotNull)
      .select(col("event_type"), md5(col("user_id").cast("string")).as("h"))
    val skDf = ev.groupBy(col("event_type"))
      .agg(graft.functions.KmvFreqAgg.kmvFreq(spark, col("h"), lit(1L), 64).as("s"))
    skDf.collect()
    val plan = skDf.queryExecution.executedPlan
    assert(plan.toString.contains("ObjectHashAggregate"),
      "kmv-freq must plan as an object-hash partial aggregate")
    def collectShuffles(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.exchange.ShuffleExchangeLike] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        collectShuffles(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.ShuffleQueryStageExec =>
        Seq(q.shuffle)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        collectShuffles(q.plan)
      case other => other.children.flatMap(collectShuffles)
    }
    val shuffles = collectShuffles(plan)
    assert(shuffles.nonEmpty)
    val written = shuffles.map(_.metrics("shuffleRecordsWritten").value).sum
    val nTasks = shuffles.map(_.numMappers).sum
    val nTypes = ev.select(col("event_type")).distinct().count()
    assert(written <= nTasks.toLong * nTypes,
      s"exchange carried $written rows; bound is tasks($nTasks) × groups($nTypes)")
  }
}
