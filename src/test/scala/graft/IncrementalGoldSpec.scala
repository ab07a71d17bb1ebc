package graft

import org.apache.spark.sql.functions._
import graft.sources.{Bronze, IncrementalGold, Tables}

/** Incremental gold refresh: when a batch re-lands a handful of bronze
  * day partitions, the daily aggregate must refresh ONLY those days —
  * equal to a full rebuild in content, byte-identical on every gold
  * partition the batch did not touch, and partition-pruned on the bronze
  * read (cost O(batch days), not O(table)).
  */
class IncrementalGoldSpec extends SparkSpec {

  test("slice-wise refresh == full rebuild; untouched gold partitions keep their files") {
    val base = TempDirs.create("graft_incr_gold_spec_")
    val (bronze, gold, goldFull) = (s"$base/bronze", s"$base/gold", s"$base/gold_full")

    // full landing + full rebuild = the wholesale expectation
    Bronze.landEvents(spark, Sf, bronze)
    IncrementalGold.rebuild(spark, bronze, goldFull)
    val expected = spark.read.parquet(goldFull)

    // incremental path: slice the feed mid-day (the cut day needs gold
    // re-aggregation after BOTH slices — the incremental correctness case)
    val events = Tables.events(spark, Sf)
    val mm = events.agg(min(col("ts")).as("lo"), max(col("ts")).as("hi")).head()
    val midMs = (mm.getTimestamp(0).getTime + mm.getTimestamp(1).getTime) / 2
    val cutLocal = java.time.Instant.ofEpochMilli(midMs)
      .atZone(java.time.ZoneOffset.UTC).toLocalDate
    val cut = new java.sql.Timestamp(
      cutLocal.atTime(12, 0).toInstant(java.time.ZoneOffset.UTC).toEpochMilli)
    val bronzeIncr = s"$base/bronze_incr"
    val slice1 = events.filter(col("ts") < lit(cut))
    val slice2 = events.filter(col("ts") >= lit(cut))

    Bronze.landEventsIncremental(spark, slice1, bronzeIncr)
    IncrementalGold.refreshDays(spark, bronzeIncr, gold, IncrementalGold.touchedDays(slice1))

    // snapshot an early gold partition slice 2 will not touch
    val hconf = spark.sessionState.newHadoopConf()
    val earlyDay = new org.apache.hadoop.fs.Path(s"$gold/event_date=2024-01-01")
    val fs = earlyDay.getFileSystem(hconf)
    def stamps() = fs.listStatus(earlyDay)
      .map(s => (s.getPath.toString, s.getModificationTime, s.getLen)).sortBy(_._1).toSeq
    val before = stamps()
    assert(before.nonEmpty, "expected an early-day gold partition from slice 1")

    Bronze.landEventsIncremental(spark, slice2, bronzeIncr)
    val touched2 = IncrementalGold.touchedDays(slice2)
    assert(!touched2.map(_.toString).contains("2024-01-01"),
      "slice 2 must not touch the snapshotted day for the test to mean anything")
    IncrementalGold.refreshDays(spark, bronzeIncr, gold, touched2)

    assert(stamps() === before,
      "a gold partition slice 2 does not touch must keep its files byte-for-byte")
    val got = spark.read.parquet(gold)
    assert(got.count() === expected.count())
    assert(got.exceptAll(expected).count() === 0 &&
           expected.exceptAll(got).count() === 0,
      "incremental refresh must equal the full rebuild")
  }

  test("the refresh's bronze read is partition-pruned to the dirty days") {
    val base = TempDirs.create("graft_incr_gold_prune_")
    val bronze = s"$base/bronze"
    Bronze.landEvents(spark, Sf, bronze)
    val allDays = spark.read.parquet(bronze).select(col("event_date"))
      .distinct().collect().map(_.getDate(0)).sortBy(_.toString)
    assert(allDays.length >= 4)
    val dirty = allDays.take(2).toSeq
    val slice = Bronze.events(spark, bronze)
      .filter(col("event_date").isInCollection(dirty))
    val scan = slice.queryExecution.executedPlan.collectLeaves().collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.getOrElse(fail("no file scan in the refresh plan"))
    assert(scan.partitionFilters.nonEmpty, "day filter must be a partition filter")
    assert(scan.selectedPartitions.partitionCount === 2,
      s"expected 2 pruned partitions, got ${scan.selectedPartitions.partitionCount}")
  }
}
