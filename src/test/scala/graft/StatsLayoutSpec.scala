package graft

import org.apache.spark.sql.functions._

import graft.operators.StatsJoin

/** The typed layout under the KmvTable maintenance contract, for ROWS
  * (r12): a no-op registration reads zero feed files; an APPEND reads
  * only the appended file and writes ONLY the touched (type, day)
  * partitions into a fresh generation (untouched partitions ride
  * forward by manifest reference, re-expressed as the catalog tables'
  * per-partition locations); a corpus MUTATION forces a full rebuild;
  * and at every step the catalog tables' contents equal the
  * from-the-feed definition row for row.
  */
class StatsLayoutSpec extends SparkSpec {

  private def ev(ids: Range, day: Int, types: Seq[String]) = {
    import spark.implicits._
    ids.map { i =>
      (i.toLong, java.sql.Timestamp.valueOf(f"2024-02-$day%02d 10:00:00"),
        (i % 50).toLong, types(i % types.size), i / 10.0)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
  }
  private val T = Seq("click", "purchase", "view")

  test("no-op reads nothing; append reads only the new file and writes " +
      "only touched partitions; mutation rebuilds; rows always equal the feed") {
    val dir = TempDirs.create("graft_layout_corp")
    val lay = TempDirs.create("graft_layout_root")
    spark.conf.set("spark.graft.evlayout.dir", lay)
    try {
      ev(1 to 600, 1, T).coalesce(1).write.parquet(s"$dir/events.parquet")
      val builds0 = StatsJoin.layoutBuilds.get()
      val scanned0 = StatsJoin.layoutFilesScanned.get()
      val tbls = StatsJoin.registerTypedTables(spark, dir)
      assert(StatsJoin.layoutBuilds.get() === builds0 + 1)
      assert(StatsJoin.layoutFilesScanned.get() === scanned0 + 1)
      // no-op: zero feed reads, no rebuild
      StatsJoin.registerTypedTables(spark, dir)
      assert(StatsJoin.layoutFilesScanned.get() === scanned0 + 1,
        "a fresh layout must be returned by manifest reference, no feed reads")
      assert(StatsJoin.layoutBuilds.get() === builds0 + 1)

      def tableRows(): Set[(String, Long, String, Long)] =
        tbls.toSeq.flatMap { case (t, tbl) =>
          spark.table(tbl).collect().map(r =>
            (t, r.getLong(0), r.getDate(1).toString, r.getLong(2)))
        }.toSet
      def feedRows(): Set[(String, Long, String, Long)] =
        graft.sources.Tables.events(spark, dir)
          .filter(col("user_id").isNotNull)
          .select(col("event_type"), col("user_id"),
            to_date(col("ts")).cast("string"),
            (col("value").cast("decimal(18,2)") * lit(100)).cast("long"))
          .collect().map(r => (r.getString(0), r.getLong(1),
            r.getString(2), r.getLong(3))).toSet
      assert(tableRows() === feedRows())

      // APPEND: one new part file touching ONLY type 'view' — a day-1
      // tail (the partition-merge path) plus a brand-new day 2
      graft.streaming.EventsStream.landFeedFile(
        ev(601 to 800, 1, Seq("view")).union(ev(801 to 1000, 2, Seq("view"))),
        s"$dir/events.parquet", "append01")
      StatsJoin.registerTypedTables(spark, dir)
      assert(StatsJoin.layoutFilesScanned.get() === scanned0 + 2,
        "append must scan exactly the appended file")
      assert(StatsJoin.layoutBuilds.get() === builds0 + 1,
        "append must not be a full rebuild")
      // the new generation holds ONLY the touched partitions ...
      val gen1 = new java.io.File(s"$lay/gen-1/parts")
      val written = gen1.listFiles().filter(_.isDirectory).flatMap(pt =>
        pt.listFiles().filter(_.isDirectory)
          .map(pd => s"${pt.getName}/${pd.getName}")).toSet
      assert(written === Set("pt=view/pd=2024-02-01", "pt=view/pd=2024-02-02"),
        s"append must write only the touched partitions, wrote $written")
      // ... while the untouched ones stay owned by gen-0
      assert(new java.io.File(s"$lay/gen-0/parts/pt=click/pd=2024-02-01").exists)
      assert(new java.io.File(s"$lay/gen-0/parts/pt=purchase/pd=2024-02-01").exists)
      // and the catalog tables serve the merged whole
      assert(tableRows() === feedRows())

      // MUTATION: regenerate the corpus in place → full rebuild, and the
      // vanished days drop out of the catalog partitions
      ev(1 to 500, 3, T).coalesce(1).write.mode("overwrite")
        .parquet(s"$dir/events.parquet")
      StatsJoin.registerTypedTables(spark, dir)
      assert(StatsJoin.layoutBuilds.get() === builds0 + 2,
        "a mutated corpus must force a full rebuild")
      assert(tableRows() === feedRows())
    } finally spark.conf.unset("spark.graft.evlayout.dir")
  }

  test("compaction is per-partition: only the fewest-partition " +
      "generations fold; the bulk build generation rides by reference") {
    val dir = TempDirs.create("graft_layout_corp3")
    val lay = TempDirs.create("graft_layout_root3")
    spark.conf.set("spark.graft.evlayout.dir", lay)
    spark.conf.set("spark.graft.layout.maxGenerations", "2")
    try {
      ev(1 to 600, 1, T).coalesce(1).write.parquet(s"$dir/events.parquet")
      StatsJoin.registerTypedTables(spark, dir) // gen-0: 3 types × day 1
      graft.streaming.EventsStream.landFeedFile(
        ev(601 to 700, 2, Seq("view")), s"$dir/events.parquet", "append01")
      StatsJoin.registerTypedTables(spark, dir) // gen-1: view/day2 — at the bound
      val scanned0 = StatsJoin.layoutFilesScanned.get()
      val builds0 = StatsJoin.layoutBuilds.get()
      // this append (view/day3) pushes live gens to {0, 1, 2}: gen-1 —
      // the generation owning the FEWEST partitions (1) — must retire,
      // its view/day2 folding into gen-2, while gen-0's three
      // build-sized partitions ride by REFERENCE (oldest-first would
      // fold the whole table here, and on every later bound hit too)
      graft.streaming.EventsStream.landFeedFile(
        ev(701 to 800, 3, Seq("view")), s"$dir/events.parquet", "append02")
      val tbls = StatsJoin.registerTypedTables(spark, dir)
      assert(StatsJoin.layoutFilesScanned.get() === scanned0 + 1,
        "compaction must not re-read the feed")
      assert(StatsJoin.layoutBuilds.get() === builds0,
        "compaction is not a full rebuild")
      val gen2 = new java.io.File(s"$lay/gen-2/parts")
      val written = gen2.listFiles().filter(_.isDirectory).flatMap(pt =>
        pt.listFiles().filter(_.isDirectory)
          .map(pd => s"${pt.getName}/${pd.getName}")).toSet
      assert(written === Set("pt=view/pd=2024-02-02", "pt=view/pd=2024-02-03"),
        s"gen-2 must hold exactly the touched + retired-gen partitions, wrote $written")
      // the bulk generation survives by reference: the catalog still
      // points every day-1 partition at gen-0
      val vLoc = spark.sessionState.catalog.listPartitions(
          org.apache.spark.sql.catalyst.TableIdentifier(tbls("view")))
        .map(p => p.spec("pd") -> p.location.toString).toMap
      assert(vLoc("2024-02-01").contains("gen-0"),
        s"the bulk generation must ride by reference, got $vLoc")
      assert(vLoc("2024-02-02").contains("gen-2") &&
        vLoc("2024-02-03").contains("gen-2"))
      // contents still equal the feed definition through the catalog
      val got = tbls.toSeq.flatMap { case (t, tbl) =>
        spark.table(tbl).collect().map(r =>
          (t, r.getLong(0), r.getDate(1).toString, r.getLong(2))) }.toSet
      val want = graft.sources.Tables.events(spark, dir)
        .filter(col("user_id").isNotNull)
        .select(col("event_type"), col("user_id"),
          to_date(col("ts")).cast("string"),
          (col("value").cast("decimal(18,2)") * lit(100)).cast("long"))
        .collect().map(r => (r.getString(0), r.getLong(1),
          r.getString(2), r.getLong(3))).toSet
      assert(got === want)
    } finally {
      spark.conf.unset("spark.graft.evlayout.dir")
      spark.conf.unset("spark.graft.layout.maxGenerations")
    }
  }

  test("compaction bounds generation fan-out without re-reading the feed") {
    val dir = TempDirs.create("graft_layout_corp2")
    val lay = TempDirs.create("graft_layout_root2")
    spark.conf.set("spark.graft.evlayout.dir", lay)
    spark.conf.set("spark.graft.layout.maxGenerations", "1")
    try {
      ev(1 to 600, 1, T).coalesce(1).write.parquet(s"$dir/events.parquet")
      StatsJoin.registerTypedTables(spark, dir) // gen-0
      val scanned0 = StatsJoin.layoutFilesScanned.get()
      val builds0 = StatsJoin.layoutBuilds.get()
      // the append alone would leave gen-0 owning click/purchase — over
      // the 1-generation cap, so this run must rewrite EVERY live
      // partition into gen-1, from the manifest references (feed reads
      // stay exactly the appended file, and it is NOT a full rebuild)
      graft.streaming.EventsStream.landFeedFile(
        ev(601 to 900, 2, Seq("view")), s"$dir/events.parquet", "append01")
      val tbls = StatsJoin.registerTypedTables(spark, dir)
      assert(StatsJoin.layoutFilesScanned.get() === scanned0 + 1,
        "compaction must not re-read the feed")
      assert(StatsJoin.layoutBuilds.get() === builds0,
        "compaction is not a full rebuild")
      val gen1 = new java.io.File(s"$lay/gen-1/parts")
      val written = gen1.listFiles().filter(_.isDirectory)
        .map(_.getName).toSet
      assert(written === T.map(t => s"pt=$t").toSet,
        s"compaction must own every live partition, wrote $written")
      // contents still equal the feed definition through the catalog
      val got = tbls.toSeq.flatMap { case (t, tbl) =>
        spark.table(tbl).collect().map(r =>
          (t, r.getLong(0), r.getDate(1).toString, r.getLong(2))) }.toSet
      val want = graft.sources.Tables.events(spark, dir)
        .filter(col("user_id").isNotNull)
        .select(col("event_type"), col("user_id"),
          to_date(col("ts")).cast("string"),
          (col("value").cast("decimal(18,2)") * lit(100)).cast("long"))
        .collect().map(r => (r.getString(0), r.getLong(1),
          r.getString(2), r.getLong(3))).toSet
      assert(got === want)
    } finally {
      spark.conf.unset("spark.graft.evlayout.dir")
      spark.conf.unset("spark.graft.layout.maxGenerations")
    }
  }
}
