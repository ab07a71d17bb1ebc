package graft

import java.nio.file.{Files, Path, Paths}
import org.apache.spark.sql.functions._
import graft.streaming.EventsStream
import graft.sources.Bronze

/** The composed production ingest path (q98): a checkpointed stream whose
  * foreachBatch lands each micro-batch via Bronze.landEventsIncremental,
  * killed and restarted mid-feed. Three properties, each proven directly
  * (the q98 oracle equality alone can't separate them):
  *
  *  1. a RESTART processes only unprocessed feed files — measured by rows
  *     seen per run, because the idempotent merge would hide a re-read;
  *  2. day partitions the restart does NOT touch keep their files
  *     byte-for-byte (landing cost stays O(batch days) at 100 TB);
  *  3. a REPLAYED batch (foreachBatch is at-least-once) is a content
  *     no-op, with the incoming row winning deterministically.
  */
class StreamingBronzeIngestSpec extends SparkSpec {

  private def md5(p: Path): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
    d.digest(Files.readAllBytes(p)).map("%02x".format(_)).mkString
  }

  /** (relative path → (size, md5)) for every data file under a day dir. */
  private def inventory(root: String): Map[String, (Long, String)] = {
    val base = Paths.get(root)
    val it = Files.walk(base).iterator()
    val out = scala.collection.mutable.Map.empty[String, (Long, String)]
    while (it.hasNext) {
      val p = it.next()
      val rel = base.relativize(p).toString
      if (Files.isRegularFile(p) && !rel.startsWith("_"))
        out(rel) = (Files.size(p), md5(p))
    }
    out.toMap
  }

  test("restart lands only new batches; untouched days byte-identical; replay is a no-op") {
    val base = TempDirs.create("graft_bronze_ingest_spec")
    val (feedDir, ckpt, bronze) = (s"$base/feed", s"$base/checkpoint", s"$base/bronze")
    val raw = graft.sources.Tables.eventsRawNanos(spark, Sf)
    val (t1, t2) = EventsStream.recoverySplit(raw)
    val (n1, n2) = (t1.count(), t2.count())

    EventsStream.landFeedFile(t1, feedDir, "tranche1")
    val seen1 = EventsStream.streamingBronzeIngestTranche(spark, feedDir, ckpt, bronze)
    assert(seen1 === n1)
    val before = inventory(bronze)

    EventsStream.landFeedFile(t2, feedDir, "tranche2")
    val seen2 = EventsStream.streamingBronzeIngestTranche(spark, feedDir, ckpt, bronze)
    // 1. the restart saw exactly tranche 2 — not a re-read the merge absorbed
    assert(seen2 === n2)

    // tranche 2's stragglers deliberately re-touch earlier days; the split
    // must actually exercise the merge path AND leave some days untouched
    val t2Days = t2.select(to_date(timestamp_micros(expr("ts div 1000"))).as("d"))
      .distinct().collect().map(_.getDate(0).toString).toSet
    val after = inventory(bronze)
    val untouchedDayFiles = before.keySet.filter { rel =>
      val day = rel.split("/").find(_.startsWith("event_date=")).map(_.stripPrefix("event_date="))
      day.exists(d => !t2Days.contains(d))
    }
    assert(untouchedDayFiles.nonEmpty, "split left no untouched day — spec is vacuous")
    assert(before.keySet.exists { rel =>
      val day = rel.split("/").find(_.startsWith("event_date=")).map(_.stripPrefix("event_date="))
      day.exists(t2Days.contains)
    }, "tranche 2 re-touches no existing day — merge path unexercised")
    // 2. untouched days' files survive the restart byte-for-byte
    untouchedDayFiles.foreach { rel =>
      assert(after.get(rel) === before.get(rel), s"untouched file changed: $rel")
    }

    // no-op retry with nothing new in the feed
    val seen3 = EventsStream.streamingBronzeIngestTranche(spark, feedDir, ckpt, bronze)
    assert(seen3 === 0)

    // 3. a replayed batch (at-least-once foreachBatch) is a content no-op
    def contents() = spark.read.parquet(bronze)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"), col("props"))
      .orderBy(col("event_id")).collect().toSeq
    val settled = contents()
    val t2Micros = t2.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    Bronze.landEventsIncremental(spark, t2Micros, bronze)
    assert(contents() === settled)

    // end state == the raw feed, row for row
    val bronzeRows = spark.read.parquet(bronze).count()
    assert(bronzeRows === n1 + n2)
    val mismatch = spark.read.parquet(bronze)
      .select(col("event_id"), col("ts"))
      .join(raw.select(col("event_id"),
          timestamp_micros(expr("ts div 1000")).as("raw_ts")), Seq("event_id"))
      .filter(col("ts") =!= col("raw_ts")).count()
    assert(mismatch === 0)

    val p = new org.apache.hadoop.fs.Path(base)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
  }
}
