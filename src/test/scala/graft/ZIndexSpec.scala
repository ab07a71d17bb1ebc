package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.ZIndex

/** q172 — zone-map data skipping over the durable z-clustered layout.
  * Pins, in order: (1) the prune reads a strict, meaningful subset of
  * the files while the result equals the direct full-scan computation
  * (soundness + effectiveness); (2) an unchanged feed is a memo hit —
  * no rebuild, no append; (3) an APPEND clusters only the new feed
  * files (zBuilds flat, the standing zone-map rows survive verbatim,
  * the appended generation holds only the delta) and the pruned result
  * tracks the grown corpus; (4) a MUTATED feed forces a full rebuild;
  * (5) the generation bound triggers the global recluster instead of
  * unbounded append-generation sprawl. NULL join keys ride in the
  * fixture throughout — they can never satisfy the box predicate, so
  * files are prunable on their non-null bounds alone. */
class ZIndexSpec extends SparkSpec {

  // zConfLock: the z-layout suites all steer spark.graft.zindex.dir on
  // the ONE shared session while suites run in parallel — hold the
  // JVM-wide lock across the whole conf window (see TempDirs.zConfLock)
  private def withConfs[T](pairs: (String, String)*)(f: => T): T =
    TempDirs.zConfLock.synchronized {
      pairs.foreach { case (k, v) => spark.conf.set(k, v) }
      try f finally pairs.foreach { case (k, _) => spark.conf.unset(k) }
    }

  /** Deterministic pseudo-scattered rows; null partkeys on a residue. */
  private def li(ids: Range, partMod: Int = 2000, orderMod: Int = 15000) = {
    import spark.implicits._
    ids.map { i =>
      (if (i % 97 == 0) None else Some(((i.toLong * 7919) % partMod)),
        (i.toLong * 104729) % orderMod,
        (i % 100).toLong,
        (i % 50 + 1).toDouble,
        Seq("A", "N", "R")(i % 3))
    }.toDF("l_partkey", "l_orderkey", "l_suppkey", "l_quantity",
      "l_returnflag")
  }

  /** The q172 aggregate computed directly on the raw fixture with the
    * same box arithmetic — the in-JVM oracle. */
  private def direct(dir: String): Seq[org.apache.spark.sql.Row] = {
    val raw = spark.read.parquet(s"$dir/lineitem.parquet")
    val b = raw.agg(min(col("l_partkey")), max(col("l_partkey")),
      min(col("l_orderkey")), max(col("l_orderkey"))).collect()(0)
    val (xlo, xhi, ylo, yhi) =
      ZIndex.box(b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
    raw.filter(col("l_partkey") >= xlo && col("l_partkey") < xhi &&
        col("l_orderkey") >= ylo && col("l_orderkey") < yhi)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
          .as("sum_qty"),
        countDistinct(col("l_suppkey")).as("n_supp"))
      .orderBy(col("l_returnflag")).collect().toSeq
  }

  test("q172: the prune reads a strict subset of the layout, the " +
      "result equals the direct computation; unchanged feed = memo hit; " +
      "append is incremental; mutation rebuilds") {
    val dir = TempDirs.create("graft_zidx_corp")
    li(0 until 20000).write.mode("overwrite")
      .parquet(s"$dir/lineitem.parquet")
    withConfs("spark.graft.zindex.dir" -> TempDirs.create("graft_zidx_root")) {
      ZIndex.clearMemo()
      val b0 = ZIndex.zBuilds.get(); val a0 = ZIndex.zAppends.get()
      val rows1 = ZIndex.q172ZorderPrune(spark, dir).collect().toSeq
      assert(ZIndex.zBuilds.get() === b0 + 1 && ZIndex.zAppends.get() === a0)
      val (total1, read1) = (ZIndex.zFilesTotal.get(), ZIndex.zFilesRead.get())
      assert(total1 === ZIndex.NFiles.toLong)
      assert(read1 < total1 / 2,
        s"a ~1%-of-z-space box must prune most of a clustered layout, " +
          s"read $read1 of $total1")
      assert(read1 >= 1 && rows1.nonEmpty)
      assert(rows1 === direct(dir))

      // unchanged feed: pure memo hit — no build, no append
      val rows2 = ZIndex.q172ZorderPrune(spark, dir).collect().toSeq
      assert(ZIndex.zBuilds.get() === b0 + 1 && ZIndex.zAppends.get() === a0)
      assert(rows2 === rows1)

      // APPEND: new feed files cluster among themselves; standing
      // zone-map rows survive verbatim; the result tracks the union
      val mapBefore = {
        val (r, g) = ZIndex.ensure(spark, dir)
        spark.read.parquet(s"$r/gen-$g/zonemap").collect()
          .map(_.getAs[String]("file")).toSet
      }
      def feedParts(): Int = new java.io.File(s"$dir/lineitem.parquet")
        .listFiles().count(f => f.getName.endsWith(".parquet"))
      val partsBefore = feedParts()
      li(20000 until 24000).write.mode("append")
        .parquet(s"$dir/lineitem.parquet")
      val newFeedFiles = feedParts() - partsBefore
      ZIndex.clearMemo() // the memo is JVM-wide; a fresh stamp must miss anyway
      val fs0 = ZIndex.zFeedFilesScanned.get()
      val rows3 = ZIndex.q172ZorderPrune(spark, dir).collect().toSeq
      assert(ZIndex.zBuilds.get() === b0 + 1,
        "an append must not trigger a full recluster")
      assert(ZIndex.zAppends.get() === a0 + 1)
      assert(ZIndex.zFeedFilesScanned.get() - fs0 === newFeedFiles.toLong,
        "an append must scan exactly the appended feed files")
      assert(rows3 === direct(dir))
      val (r3, g3) = ZIndex.ensure(spark, dir)
      val mapAfter = spark.read.parquet(s"$r3/gen-$g3/zonemap").collect()
        .map(_.getAs[String]("file")).toSet
      assert(mapBefore.subsetOf(mapAfter),
        "standing zone-map rows must ride the append by reference")
      val newFiles = mapAfter -- mapBefore
      assert(newFiles.nonEmpty &&
        newFiles.forall(_.startsWith(s"gen-$g3/")),
        s"appended rows must land in the new generation only, got $newFiles")
      // the appended generation holds exactly the delta's rows
      val appended = spark.read
        .parquet(newFiles.toSeq.map(f => s"$r3/$f"): _*).count()
      assert(appended === 4000L)

      // MUTATION: a consumed file vanishing forces the full rebuild
      li(0 until 9000).write.mode("overwrite")
        .parquet(s"$dir/lineitem.parquet")
      val rows4 = ZIndex.q172ZorderPrune(spark, dir).collect().toSeq
      assert(ZIndex.zBuilds.get() === b0 + 2,
        "a mutated feed must force a full rebuild")
      assert(rows4 === direct(dir))
    }
  }

  test("concurrent ensure() calls on one root serialize: exactly one " +
      "build, every caller sees the committed generation") {
    val dir = TempDirs.create("graft_zidx_corp5")
    li(0 until 6000).write.mode("overwrite")
      .parquet(s"$dir/lineitem.parquet")
    withConfs("spark.graft.zindex.dir" -> TempDirs.create("graft_zidx_root5")) {
      ZIndex.clearMemo()
      val b0 = ZIndex.zBuilds.get()
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      val results = Await.result(
        Future.sequence((1 to 4).map(_ =>
          Future(ZIndex.ensure(spark, dir)))), 120.seconds)
      assert(results.toSet.size === 1,
        s"every concurrent caller must land on one committed " +
          s"generation, got ${results.toSet}")
      assert(ZIndex.zBuilds.get() === b0 + 1,
        "the root lock must serialize to exactly ONE build")
      assert(ZIndex.q172ZorderPrune(spark, dir).collect().toSeq ===
        direct(dir))
    }
  }

  test("the footer-read zone map equals the per-file aggregate truth") {
    val dir = TempDirs.create("graft_zidx_corp4")
    li(0 until 10000).write.mode("overwrite")
      .parquet(s"$dir/lineitem.parquet")
    withConfs("spark.graft.zindex.dir" -> TempDirs.create("graft_zidx_root4")) {
      ZIndex.clearMemo()
      val (r, g) = ZIndex.ensure(spark, dir)
      // the v2 wide schema records <col>__min/__max/__nulls for every
      // supported column; pin the two clustered LONG dimensions AND a
      // STRING zone column against the per-file aggregate truth
      val zm = spark.read.parquet(s"$r/gen-$g/zonemap").collect()
        .map(row => row.getAs[String]("file") -> (
          row.getAs[Long]("np"),
          if (row.isNullAt(row.fieldIndex("l_partkey__min"))) None
          else Some(row.getAs[Long]("l_partkey__min")),
          if (row.isNullAt(row.fieldIndex("l_partkey__max"))) None
          else Some(row.getAs[Long]("l_partkey__max")),
          row.getAs[Long]("l_orderkey__min"),
          row.getAs[Long]("l_orderkey__max"),
          row.getAs[String]("l_returnflag__min"),
          row.getAs[String]("l_returnflag__max"))).toMap
      val truth = spark.read.parquet(s"$r/gen-$g/files")
        .groupBy(input_file_name().as("f"))
        .agg(count(lit(1)).as("np"),
          min(col("l_partkey")).as("pmin"), max(col("l_partkey")).as("pmax"),
          min(col("l_orderkey")).as("omin"), max(col("l_orderkey")).as("omax"),
          min(col("l_returnflag")).as("fmin"),
          max(col("l_returnflag")).as("fmax"))
        .collect()
        .map(row => (s"gen-$g/files/" +
            row.getAs[String]("f").split("/").last) -> (
          row.getAs[Long]("np"),
          if (row.isNullAt(row.fieldIndex("pmin"))) None
          else Some(row.getAs[Long]("pmin")),
          if (row.isNullAt(row.fieldIndex("pmax"))) None
          else Some(row.getAs[Long]("pmax")),
          row.getAs[Long]("omin"), row.getAs[Long]("omax"),
          row.getAs[String]("fmin"), row.getAs[String]("fmax"))).toMap
      assert(zm === truth,
        "the zone map read from parquet footers must equal the " +
          "per-file aggregate computed from the data (incl. null-bound " +
          "files where every partkey in the file is null)")
      // the fixture's null-partkey residue guarantees at least the
      // possibility of an all-null file; assert the map covers every
      // written file either way
      assert(zm.keySet === truth.keySet && zm.nonEmpty)
    }
  }

  /** q174's in-JVM oracle: the orderkey band aggregate off the raw
    * fixture. */
  private def direct1d(dir: String): Seq[org.apache.spark.sql.Row] = {
    val raw = spark.read.parquet(s"$dir/lineitem.parquet")
    val b = raw.agg(min(col("l_orderkey")), max(col("l_orderkey"))).collect()(0)
    val (ylo, yhi) = ZIndex.band(b.getLong(0), b.getLong(1))
    raw.filter(col("l_orderkey") >= ylo && col("l_orderkey") < yhi)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
          .as("sum_qty"),
        countDistinct(col("l_suppkey")).as("n_supp"))
      .orderBy(col("l_returnflag")).collect().toSeq
  }

  test("q174: a NON-LEADING-column range over the same layout still " +
      "prunes (the composite-B-tree claim) and equals the direct " +
      "computation") {
    val dir = TempDirs.create("graft_zidx_corp3")
    li(0 until 20000).write.mode("overwrite")
      .parquet(s"$dir/lineitem.parquet")
    withConfs("spark.graft.zindex.dir" -> TempDirs.create("graft_zidx_root3")) {
      ZIndex.clearMemo()
      val rows = ZIndex.q174ZorderOnedim(spark, dir).collect().toSeq
      val (total, read) = (ZIndex.zFilesTotal.get(), ZIndex.zFilesRead.get())
      assert(rows.nonEmpty && rows === direct1d(dir))
      // a 10% orderkey band keeps ~1 strip of the 8×8 z-grid — well
      // under half the files, though more than q172's 2-D cell
      assert(read < total / 2,
        s"an orderkey-only band must prune most of the layout " +
          s"(read $read of $total)")
    }
  }

  test("q172: the generation bound swaps append sprawl for a global " +
      "recluster") {
    val dir = TempDirs.create("graft_zidx_corp2")
    li(0 until 8000).write.mode("overwrite")
      .parquet(s"$dir/lineitem.parquet")
    withConfs(
      "spark.graft.zindex.dir" -> TempDirs.create("graft_zidx_root2"),
      "spark.graft.zindex.maxGenerations" -> "2") {
      ZIndex.clearMemo()
      val b0 = ZIndex.zBuilds.get(); val a0 = ZIndex.zAppends.get()
      ZIndex.ensure(spark, dir) // gen-0: full build
      li(8000 until 9000).write.mode("append").parquet(s"$dir/lineitem.parquet")
      ZIndex.ensure(spark, dir) // gen-1: append (2 live gens — at the bound)
      assert(ZIndex.zBuilds.get() === b0 + 1 && ZIndex.zAppends.get() === a0 + 1)
      li(9000 until 10000).write.mode("append").parquet(s"$dir/lineitem.parquet")
      val (r, g) = ZIndex.ensure(spark, dir) // would be 3 live gens: recluster
      assert(ZIndex.zBuilds.get() === b0 + 2 && ZIndex.zAppends.get() === a0 + 1,
        "exceeding the generation bound must recluster, not append")
      val gens = spark.read.parquet(s"$r/gen-$g/zonemap").collect()
        .map(_.getAs[String]("file").split("/")(0)).toSet
      assert(gens === Set(s"gen-$g"),
        s"the recluster must own every file, got $gens")
      assert(ZIndex.q172ZorderPrune(spark, dir).collect().toSeq === direct(dir))
    }
  }
}
