package graft

import org.apache.spark.sql.functions._
import graft.operators.KmvTable

/** q151 incremental sketch-table maintenance: fresh build must equal
  * the daily bottom-k definition; a no-op maintenance must scan ZERO
  * files; an append must scan ONLY the appended file and land on the
  * byte-identical table a from-scratch build produces (the union-
  * resketch law, this time across maintenance runs); a corpus MUTATION
  * must be detected and force a full rebuild rather than serving a
  * stale merge.
  */
class KmvMaintainSpec extends SparkSpec {

  private def withTableDir[T](f: => T): T = {
    spark.conf.set("spark.graft.kmv.tableDir", TempDirs.create("graft_kmv_tbl"))
    try f finally spark.conf.unset("spark.graft.kmv.tableDir")
  }

  private def tableRows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getDate(1).toString) ->
      r.getSeq[String](2).toList).toMap

  test("fresh build equals the daily bottom-k definition (gate data)") {
    withTableDir {
      val t = tableRows(KmvTable.maintain(spark, Sf))
      val naive = graft.sources.Tables.events(spark, Sf)
        .filter(col("user_id").isNotNull)
        .select(col("event_type"), to_date(col("ts")).as("d"),
          md5(col("user_id").cast("string")).as("h"))
        .distinct()
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("event_type"), col("d")).orderBy(col("h"))))
        .filter(col("rn") <= 64)
        .groupBy(col("event_type"), col("d"))
        .agg(sort_array(collect_list(col("h"))).as("ks"))
        .collect().map(r => (r.getString(0), r.getDate(1).toString) ->
          r.getSeq[String](2).toList).toMap
      assert(t === naive)
      // and the oracled query over the same table is well-formed
      val q = KmvTable.q151KmvMaintain(spark, Sf).collect()
      assert(q.length === t.size)
      q.foreach { r =>
        if (r.getAs[Long]("n_kept") < 64)
          assert(r.getAs[Double]("kmv_estimate") ===
            r.getAs[Long]("n_distinct").toDouble) // saturation rule
      }
    }
  }

  test("append scans only the new file and matches a from-scratch build") {
    import spark.implicits._
    def ev(ids: Range, day: Int) = ids.map { i =>
      (i.toLong, java.sql.Timestamp.valueOf(f"2024-01-$day%02d 12:00:00"),
        (i % 500).toLong, "click", 1.0)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")

    // corpus A: two days in one part file
    val full = TempDirs.create("graft_kmv_corpA")
    ev(1 to 800, 1).union(ev(801 to 1600, 2))
      .coalesce(1).write.parquet(s"$full/events.parquet")
    val fromScratch = withTableDir { tableRows(KmvTable.maintain(spark, full)) }

    // corpus B: same rows, landed as two files with a maintenance run
    // between — the incremental path must converge to the same table
    val incr = TempDirs.create("graft_kmv_corpB")
    ev(1 to 800, 1).coalesce(1).write.parquet(s"$incr/events.parquet")
    withTableDir {
      KmvTable.maintain(spark, incr)
      val before = KmvTable.filesScanned.get()
      // no-op maintenance: zero files scanned
      KmvTable.maintain(spark, incr)
      assert(KmvTable.filesScanned.get() === before)
      // append day 2 as a second part file
      graft.streaming.EventsStream.landFeedFile(
        ev(801 to 1600, 2), s"$incr/events.parquet", "append01")
      val t2 = tableRows(KmvTable.maintain(spark, incr))
      assert(KmvTable.filesScanned.get() === before + 1,
        "append must scan exactly the one new file")
      assert(t2 === fromScratch,
        "incremental merge must converge to the from-scratch table")
    }
  }

  test("append rewrites only appended days; untouched partitions byte-identical") {
    import spark.implicits._
    def ev(ids: Range, day: Int) = ids.map { i =>
      (i.toLong, java.sql.Timestamp.valueOf(f"2024-01-$day%02d 12:00:00"),
        (i % 500).toLong, "click", 1.0)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    val dir = TempDirs.create("graft_kmv_gens")
    val tbl = TempDirs.create("graft_kmv_gens_tbl")
    spark.conf.set("spark.graft.kmv.tableDir", tbl)
    try {
      ev(1 to 800, 1).coalesce(1).write.parquet(s"$dir/events.parquet")
      KmvTable.maintain(spark, dir).count() // gen-0
      graft.streaming.EventsStream.landFeedFile(
        ev(801 to 1600, 2), s"$dir/events.parquet", "append01")
      KmvTable.maintain(spark, dir).count() // gen-1
      // only the appended day's partition was re-sketched/rewritten
      assert(KmvTable.lastRewrittenPartitions.get() ===
        Set("event_type=click/d=2024-01-02"))
      // the untouched day rode forward byte-identical (copied, not
      // recomputed) — the IncrementalBronzeSpec assertion applied to
      // the sketch table
      def partBytes(gen: String): Seq[Seq[Byte]] = {
        val d = new java.io.File(s"$tbl/$gen/sketches/event_type=click/d=2024-01-01")
        assert(d.isDirectory, s"missing partition dir in $gen")
        d.listFiles.filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
          .map(f => java.nio.file.Files.readAllBytes(f.toPath).toSeq).toSeq
      }
      assert(partBytes("gen-1") === partBytes("gen-0"))
      // commit protocol: both generations committed; the prior one is
      // RETAINED (crash/laggy-reader safety)
      assert(new java.io.File(s"$tbl/gen-0/_COMMITTED").exists)
      assert(new java.io.File(s"$tbl/gen-1/_COMMITTED").exists)
      // an uncommitted partial generation is invisible to readers and
      // swept by the next maintenance write
      new java.io.File(s"$tbl/gen-7/sketches").mkdirs()
      val noop = KmvTable.maintain(spark, dir)
      assert(noop.count() === 2) // still served from gen-1
      graft.streaming.EventsStream.landFeedFile(
        ev(1601 to 2000, 3), s"$dir/events.parquet", "append02")
      KmvTable.maintain(spark, dir).count() // gen-2
      assert(!new java.io.File(s"$tbl/gen-7").exists,
        "uncommitted leftover must be swept")
      assert(new java.io.File(s"$tbl/gen-2/_COMMITTED").exists)
      assert(!new java.io.File(s"$tbl/gen-0").exists,
        "generations older than the retained prior must be swept")
      assert(new java.io.File(s"$tbl/gen-1").exists)
    } finally spark.conf.unset("spark.graft.kmv.tableDir")
  }

  test("corpus mutation forces a full rebuild, never a stale merge") {
    import spark.implicits._
    def ev(ids: Range, users: Int) = ids.map { i =>
      (i.toLong, java.sql.Timestamp.valueOf("2024-02-01 08:00:00"),
        (i % users).toLong, "view", 1.0)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    val dir = TempDirs.create("graft_kmv_mut")
    ev(1 to 300, 100).coalesce(1).write.parquet(s"$dir/events.parquet")
    withTableDir {
      KmvTable.maintain(spark, dir)
      val rebuildsBefore = KmvTable.fullRebuilds.get()
      // REGENERATE the corpus in place: same path, different contents
      ev(1 to 300, 37).coalesce(1).write.mode("overwrite")
        .parquet(s"$dir/events.parquet")
      val t = tableRows(KmvTable.maintain(spark, dir))
      assert(KmvTable.fullRebuilds.get() === rebuildsBefore + 1,
        "mutated corpus must trip the per-file identity check")
      // table reflects ONLY the new corpus: 37 distinct users
      assert(t(("view", "2024-02-01")).size === 37)
    }
  }
}
