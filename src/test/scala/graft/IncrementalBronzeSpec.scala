package graft

import org.apache.spark.sql.functions._
import graft.sources.{Bronze, Tables}

/** Incremental bronze landing (the reference's 6h ingest cadence,
  * `dags/ingest_observations_dag.py:30`, made real): landing the feed in
  * two time slices must equal the one-shot landing, rewrite ONLY the
  * days a slice touches, merge (not replace) a day that straddles the
  * slice boundary, and absorb a replayed slice as a no-op.
  */
class IncrementalBronzeSpec extends SparkSpec {

  test("two-slice incremental landing == one-shot; untouched days keep their files") {
    val base = TempDirs.create("graft_incr_bronze_")
    val (oneShot, incr) = (s"$base/oneshot", s"$base/incr")
    Bronze.landEvents(spark, Sf, oneShot)
    val expected = spark.read.parquet(oneShot)

    // split mid-day so the cut day has rows in BOTH slices — a day-level
    // overwrite (instead of a merge) would lose the first slice's rows
    val events = Tables.events(spark, Sf)
    val mm = events.agg(min(col("ts")).as("lo"), max(col("ts")).as("hi")).head()
    val midMs = (mm.getTimestamp(0).getTime + mm.getTimestamp(1).getTime) / 2
    val cutLocal = java.time.Instant.ofEpochMilli(midMs)
      .atZone(java.time.ZoneOffset.UTC).toLocalDate
    // NOON of the midpoint day, so both slices hold hours of that day
    val cut = new java.sql.Timestamp(
      cutLocal.atTime(12, 0).toInstant(java.time.ZoneOffset.UTC).toEpochMilli)
    val slice1 = events.filter(col("ts") < lit(cut))
    val slice2 = events.filter(col("ts") >= lit(cut))
    val cutDay = cutLocal.toString
    assert(slice1.filter(to_date(col("ts")) === cutDay).count() > 0 &&
           slice2.filter(to_date(col("ts")) === cutDay).count() > 0,
      "cut must straddle a day for the merge case to be exercised")

    Bronze.landEventsIncremental(spark, slice1, incr)
    // snapshot an early partition slice 2 will NOT touch
    val hconf = spark.sessionState.newHadoopConf()
    val earlyDay = new org.apache.hadoop.fs.Path(s"$incr/event_date=2024-01-01")
    val fs = earlyDay.getFileSystem(hconf)
    def fileStamps() = fs.listStatus(earlyDay)
      .map(s => (s.getPath.toString, s.getModificationTime, s.getLen)).sortBy(_._1).toSeq
    val before = fileStamps()
    assert(before.nonEmpty, "expected an early-day partition from slice 1")

    Bronze.landEventsIncremental(spark, slice2, incr)
    assert(fileStamps() === before,
      "a day slice 2 does not touch must keep its files byte-for-byte")
    val got = spark.read.parquet(incr)
    assert(got.count() === expected.count())
    assert(got.exceptAll(expected).count() === 0 &&
           expected.exceptAll(got).count() === 0,
      "incremental landing must equal the one-shot landing")

    // replaying slice 2 (the reference's task retry) is a no-op
    Bronze.landEventsIncremental(spark, slice2, incr)
    val replayed = spark.read.parquet(incr)
    assert(replayed.exceptAll(expected).count() === 0 &&
           expected.exceptAll(replayed).count() === 0,
      "replayed slice must not change the table")
  }

  test("retry after a failed first landing converges instead of crashing") {
    // a killed first write leaves the target dir existing but empty (job
    // abort removes _temporary, not the dir) — the retry must treat it as
    // absent, not read it as a parquet table
    val base = TempDirs.create("graft_incr_retry_")
    val path = s"$base/events"
    new java.io.File(path).mkdirs()
    val events = Tables.events(spark, Sf)
    Bronze.landEventsIncremental(spark, events, path)
    assert(spark.read.parquet(path).count() === events.count())
  }
}
