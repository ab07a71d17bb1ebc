package graft

import graft.sources.Compact

class CompactSpec extends SparkSpec {
  import spark.implicits._

  test("compaction collapses small files, preserves rows, cleans staging") {
    val path = TempDirs.create("graft_compact") + "/" + "t"
    val df = (1 to 10000).map(i => (i.toLong, s"row_$i", i * 0.5)).toDF("id", "name", "v")
    df.repartition(50).write.parquet(path)

    val before = spark.read.parquet(path)
    val stats = Compact.compactParquet(spark, path, targetFileBytes = 1L * 1024 * 1024)
    assert(stats.filesBefore === 50)
    assert(stats.filesAfter < 50 && stats.filesAfter >= 1)

    val after = spark.read.parquet(path)
    assert(after.count() === 10000)
    assert(after.exceptAll(df).count() === 0)
    assert(df.exceptAll(after).count() === 0)

    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(!fs.exists(new org.apache.hadoop.fs.Path(path + ".compacting")))
    // before-frame was read pre-compaction; not used further (files swapped)
    assert(before != null)
  }

  test("already-compact directory is a no-op") {
    val path = TempDirs.create("graft_compact2") + "/" + "t"
    Seq((1, "a"), (2, "b")).toDF("id", "s").coalesce(1).write.parquet(path)
    val stats = Compact.compactParquet(spark, path)
    assert(stats.filesBefore === 1 && stats.filesAfter === 1)
    assert(spark.read.parquet(path).count() === 2)
  }
}
