package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import graft.streaming.{EventsStream, StreamTune}

/** The r16 streaming-lane optimization: shuffle/state partitioning
  * derived from SOURCE BYTES instead of the core-count session default
  * (structured streaming cannot ride AQE coalescing, and every
  * stateful operator pays a fixed per-partition per-batch state-store
  * protocol cost — measured 2-3× of several streaming queries' wall
  * time at sf0.1; OPTIMIZATION_r16.md §streaming). Pins: the
  * derivation arithmetic under its three conf knobs, the set/restore
  * window (including the exception path), and that a stream run
  * through the tuned harness actually PLANS its stateful operator at
  * the derived count while leaving the session conf untouched after.
  */
class StreamTuneSpec extends SparkSpec {

  test("statePartitions: input-derived with floor and cap, conf-overridable") {
    val s = spark
    // the sf0.001 events file is far under one 8 MB target → floor (4)
    assert(StreamTune.statePartitions(s, Seq(s"$Sf/events.parquet")) == 4)
    // a missing path contributes zero bytes → still the floor
    assert(StreamTune.statePartitions(s, Seq(s"$Sf/no_such.parquet")) == 4)
    TempDirs.zConfLock.synchronized {
      val keys = Seq("spark.graft.stream.bytesPerPartition",
        "spark.graft.stream.minPartitions",
        "spark.graft.stream.maxPartitions")
      try {
        // 1 KB per partition: the fixture events file (~tens of KB)
        // must now derive more than the floor, and the cap must bind
        s.conf.set(keys(0), "1024")
        val derived = StreamTune.statePartitions(s, Seq(s"$Sf/events.parquet"))
        assert(derived > 4, s"1 KB target must out-derive the floor, got $derived")
        s.conf.set(keys(2), "6")
        assert(StreamTune.statePartitions(s, Seq(s"$Sf/events.parquet")) == 6)
        s.conf.set(keys(1), "9") // floor above cap: floor wins (max binds last)
        assert(StreamTune.statePartitions(s, Seq(s"$Sf/events.parquet")) == 9)
      } finally keys.foreach(s.conf.unset)
    }
  }

  test("withStatePartitions: sets the derived value inside, restores after, exception-safe") {
    val s = spark
    TempDirs.zConfLock.synchronized {
      val key = "spark.sql.shuffle.partitions"
      val prior = s.conf.get(key)
      try {
        s.conf.set("spark.graft.stream.minPartitions", "7")
        val inside = StreamTune.withStatePartitions(s, Seq(s"$Sf/events.parquet")) {
          s.conf.get(key)
        }
        assert(inside == "7")
        assert(s.conf.get(key) == prior, "window must restore the prior value")
        intercept[RuntimeException] {
          StreamTune.withStatePartitions(s, Seq(s"$Sf/events.parquet")) {
            throw new RuntimeException("boom")
          }
        }
        assert(s.conf.get(key) == prior, "restore must survive a throwing body")
      } finally s.conf.unset("spark.graft.stream.minPartitions")
    }
  }

  test("a stateful stream under the window plans its state operator at the derived count") {
    val s = spark
    TempDirs.zConfLock.synchronized {
      val prior = s.conf.get("spark.sql.shuffle.partitions")
      try {
        s.conf.set("spark.graft.stream.minPartitions", "3")
        s.conf.set("spark.graft.stream.maxPartitions", "3")
        val q = StreamTune.withStatePartitions(s, Seq(s"$Sf/events.parquet")) {
          val q0 = EventsStream.hourlyWindowAgg(
            EventsStream.readEvents(s, Sf)).writeStream
            .outputMode(OutputMode.Complete)
            .format("memory").queryName("stream_tune_spec")
            .trigger(Trigger.AvailableNow())
            .start()
          q0.awaitTermination()
          q0
        }
        val stateOps = q.lastProgress.stateOperators
        assert(stateOps.nonEmpty, "the windowed agg must carry state")
        assert(stateOps.head.numShufflePartitions == 3,
          s"state operator must run at the derived count, " +
            s"got ${stateOps.head.numShufflePartitions}")
        assert(s.conf.get("spark.sql.shuffle.partitions") == prior)
        // the tuned run's answer equals the batch rollup (the q51
        // contract — partitioning must be invisible in the result)
        val streamed = s.table("stream_tune_spec")
          .select(col("window_start"), col("event_type"), col("n"), col("sum_value"))
        val batch = graft.sources.Tables.events(s, Sf)
          .groupBy(date_trunc("hour", col("ts")).as("window_start"), col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
        assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
          "tuned streamed rollup must equal the batch rollup")
      } finally {
        s.conf.unset("spark.graft.stream.minPartitions")
        s.conf.unset("spark.graft.stream.maxPartitions")
      }
    }
  }
}
