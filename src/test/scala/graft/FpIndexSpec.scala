package graft

import org.apache.spark.sql.functions._

import graft.operators.{FpIndex, ZIndex}

/** q190 — the durable fingerprint index + streaming novelty gate.
  * Pins:
  * (1) the gate's output equals the batch standing-membership filter
  *     (novel docs pass, exact duplicates of standing docs are
  *     refuted);
  * (2) an appended feed is an O(delta) index APPEND (zAppends, not
  *     zBuilds) and newly-standing fingerprints start refuting
  *     matching batch docs. */
class FpIndexSpec extends SparkSpec {

  private def withConfs[T](pairs: (String, String)*)(f: => T): T =
    TempDirs.zConfLock.synchronized {
      pairs.foreach { case (k, v) => spark.conf.set(k, v) }
      try f finally pairs.foreach { case (k, _) => spark.conf.unset(k) }
    }

  /** Every doc with id ≡ 0 (mod 20) exactly duplicates the standing
    * doc id+1's text; other batch docs are unique. */
  private def docs(ids: Seq[Int]) = {
    import spark.implicits._
    ids.map { i =>
      val text = if (i % 20 == 0) s"shared body ${i + 1} x y z"
        else if (i % 20 == 1) s"shared body $i x y z"
        else s"unique body $i a b c"
      (i.toLong, "src", text)
    }.toDF("doc_id", "source", "text")
  }

  private def gate(dir: String): Seq[(Long, String)] =
    FpIndex.q190StreamNoveltyGate(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted

  private def batchTruth(dir: String): Seq[(Long, String)] = {
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), md5(col("text")).as("fp"))
    d.filter(col("doc_id") % 10 === 0)
      .join(d.filter(col("doc_id") % 10 =!= 0).select(col("fp")),
        Seq("fp"), "left_anti")
      .select(col("doc_id"), col("fp"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
  }

  test("the gate equals the batch membership filter: exact dupes of " +
      "standing docs are refuted, novel docs pass") {
    val dir = TempDirs.create("graft_fpidx_corp")
    docs(0 until 200).coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    withConfs("spark.graft.zindex.dir" ->
        TempDirs.create("graft_fpidx_root")) {
      ZIndex.clearMemo()
      val got = gate(dir)
      assert(got === batchTruth(dir))
      val ids = got.map(_._1).toSet
      assert(!ids.exists(_ % 20 == 0),
        "duplicates of standing texts must be refuted")
      assert(ids.exists(_ % 20 != 0), "novel batch docs must pass")
    }
  }

  test("an appended feed is an O(delta) index append and its new " +
      "fingerprints refute matching batch docs") {
    val dir = TempDirs.create("graft_fpidx_corp2")
    docs(0 until 200).coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    withConfs("spark.graft.zindex.dir" ->
        TempDirs.create("graft_fpidx_root2")) {
      ZIndex.clearMemo()
      val before = gate(dir).map(_._1).toSet
      val novel = before.find(_ % 20 != 0).getOrElse(fail("need a novel doc"))
      val builds0 = ZIndex.zBuilds.get()
      val appends0 = ZIndex.zAppends.get()
      // append STANDING docs (ids ≢ 0 mod 10) one of which duplicates
      // the previously-novel batch doc's text
      import spark.implicits._
      Seq((1001L, "src", s"unique body $novel a b c"),
        (1002L, "src", "brand new standing text"))
        .toDF("doc_id", "source", "text")
        .coalesce(1).write.mode("append").parquet(s"$dir/documents.parquet")
      val after = gate(dir).map(_._1).toSet
      assert(ZIndex.zBuilds.get() === builds0,
        "an append must not rebuild the fingerprint index")
      assert(ZIndex.zAppends.get() === appends0 + 1)
      assert(!after.contains(novel),
        "the newly-standing fingerprint must refute the batch doc")
      assert(after === batchTruth(dir).map(_._1).toSet)
    }
  }
}
