package graft

import org.apache.spark.sql.functions._
import graft.sources.{Bronze, Tables}

/** Right-to-be-forgotten over the bronze landing (`Bronze.redactUsers`):
  * the deletion must be partition-surgical — only days that contain the
  * opted-out users are rewritten, untouched days keep their files
  * byte-for-byte — and idempotent. This is the write-side counterpart of
  * q131's audit query.
  */
class RedactionSpec extends SparkSpec {

  test("redactUsers removes exactly the opt-out rows, touching only their days") {
    val base = TempDirs.create("graft_redact_")
    val bronze = s"$base/bronze"
    Bronze.landEvents(spark, Sf, bronze)
    val before = spark.read.parquet(bronze).localCheckpoint()
    val total = before.count()

    // the real user with the FEWEST active days (so some days stay
    // untouched — at sf0.001 every user is active most of the month), plus
    // one id that doesn't exist (deleting a stranger must be a no-op
    // contribution)
    val victims = before.filter(col("user_id").isNotNull)
      .groupBy(col("user_id"))
      .agg(countDistinct(col("event_date")).as("nd"))
      .orderBy(col("nd"), col("user_id")).limit(1)
      .collect().map(_.getLong(0)).toSeq
    val optOut = spark.createDataFrame(
      spark.sparkContext.parallelize(
        (victims :+ -1L).map(org.apache.spark.sql.Row(_))),
      new org.apache.spark.sql.types.StructType()
        .add("user_id", org.apache.spark.sql.types.LongType))

    val victimRows = before.filter(col("user_id").isin(victims: _*)).count()
    assert(victimRows > 0, "victims must have rows for the test to bite")
    val victimDays = before.filter(col("user_id").isin(victims: _*))
      .select(col("event_date")).distinct()
      .collect().map(_.get(0).toString).toSet
    val allDays = before.select(col("event_date")).distinct()
      .collect().map(_.get(0).toString).toSet
    val untouchedDay = (allDays -- victimDays).headOption
    assert(untouchedDay.isDefined,
      s"need a day the victim never visited (victim covers ${victimDays.size}/${allDays.size})")

    val hconf = spark.sessionState.newHadoopConf()
    val udPath = new org.apache.hadoop.fs.Path(s"$bronze/event_date=${untouchedDay.get}")
    val fs = udPath.getFileSystem(hconf)
    def stamps() = fs.listStatus(udPath)
      .map(s => (s.getPath.toString, s.getModificationTime, s.getLen)).sortBy(_._1).toSeq
    val untouchedBefore = stamps()

    val removed = Bronze.redactUsers(spark, bronze, optOut)
    assert(removed === victimRows, "must remove exactly the victims' rows")

    // redactUsers' join moves user_id first in the rewritten files;
    // exceptAll is positional, so align every comparison to before's order
    val cols = before.columns.map(col).toIndexedSeq
    val after = spark.read.parquet(bronze).select(cols: _*)
    assert(after.count() === total - victimRows)
    assert(after.filter(col("user_id").isin(victims: _*)).count() === 0,
      "no trace of the opted-out users may remain")
    // NULL-user rows are not deletable and must survive
    assert(after.filter(col("user_id").isNull).count() ===
           before.filter(col("user_id").isNull).count())
    assert(stamps() === untouchedBefore,
      "a day the victims never visited must keep its files byte-for-byte")
    // survivors in the rewritten days are intact (not just counted):
    val expectedSurvivors = before
      .filter(!col("user_id").isin(victims: _*) || col("user_id").isNull)
    assert(after.exceptAll(expectedSurvivors).count() === 0 &&
           expectedSurvivors.exceptAll(after).count() === 0,
      "rewritten days must carry exactly the non-victim rows")

    // idempotent: a second run finds nothing and writes nothing
    val untouchedAll = after.localCheckpoint()
    assert(Bronze.redactUsers(spark, bronze, optOut) === 0L)
    val again = spark.read.parquet(bronze).select(cols: _*)
    assert(again.exceptAll(untouchedAll).count() === 0 &&
           untouchedAll.exceptAll(again).count() === 0)
  }
}
