package graft

import org.apache.spark.sql.functions._

/** Backs the "pair with dynamic partition overwrite" claim: with
  * `partitionOverwriteMode=dynamic`, rewriting one partition's batch
  * touches ONLY that partition — the write pattern that keeps micro-batch
  * upserts from rewriting a 100 TB table.
  */
class DynamicOverwriteSpec extends SparkSpec {
  import spark.implicits._

  test("dynamic mode overwrites only the partitions present in the batch") {
    val path = TempDirs.create("graft_dyn") + "/" + "t"
    val day1 = Seq((1L, "2024-01-01", 10.0), (2L, "2024-01-01", 20.0))
    val day2 = Seq((3L, "2024-01-02", 30.0))
    (day1 ++ day2).toDF("id", "day", "v")
      .write.partitionBy("day").parquet(path)

    val saved = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    try {
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      // rewrite ONLY day2 with a corrected row
      Seq((3L, "2024-01-02", 99.0)).toDF("id", "day", "v")
        .write.mode("overwrite").partitionBy("day").parquet(path)

      val out = spark.read.parquet(path).orderBy("id")
        .collect().map(r => (r.getAs[Long]("id"), r.getAs[Double]("v")))
      // day1 rows survive untouched; day2 replaced
      assert(out.toSeq === Seq((1L, 10.0), (2L, 20.0), (3L, 99.0)))

      // and in static mode (the default) the same write nukes day1 — the
      // failure mode dynamic exists to prevent
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
      Seq((4L, "2024-01-02", 1.0)).toDF("id", "day", "v")
        .write.mode("overwrite").partitionBy("day").parquet(path)
      assert(spark.read.parquet(path).count() === 1)
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }
}
