package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema evolution across partition generations — the 100 TB reality a
  * static-schema test corpus hides: a feed adds a column mid-history and
  * the landed table holds BOTH file schemas forever (rewriting petabytes
  * of old partitions is not an option). Two read contracts must hold:
  *
  *  - `mergeSchema=true` unions the generations (new column null-filled
  *    for old files) — the exploratory read;
  *  - an EXPLICIT schema pins a version: v1 readers keep working
  *    unchanged after the feed evolves (new columns invisible), and a
  *    v2 schema over v1 files null-fills — the production contract,
  *    since per-file schema inference order is otherwise undefined.
  */
class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  test("bronze-style reads span schema generations") {
    val path = TempDirs.create("graft_schema_evo_") + "/" + "t"
    // generation 1: (id, v) on day 1
    Seq((1L, 10.0, "2024-01-01"), (2L, 20.0, "2024-01-01"))
      .toDF("id", "v", "day").write.partitionBy("day").parquet(path)
    // generation 2: the feed adds quality_flag on day 2
    Seq((3L, 30.0, "ok", "2024-01-02"))
      .toDF("id", "v", "quality_flag", "day")
      .write.mode("append").partitionBy("day").parquet(path)

    // exploratory read: union of generations, old rows null-filled
    val merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert(merged.columns.toSet === Set("id", "v", "quality_flag", "day"))
    assert(merged.count() === 3)
    assert(merged.filter(col("quality_flag").isNull).count() === 2,
      "generation-1 rows must null-fill the new column")
    assert(merged.filter(col("quality_flag") === "ok").count() === 1)

    // v1 production reader: pinned schema, unaffected by the evolution
    val v1 = StructType(Seq(
      StructField("id", LongType), StructField("v", DoubleType),
      StructField("day", StringType)))
    val v1Read = spark.read.schema(v1).parquet(path)
    assert(v1Read.columns.toSet === Set("id", "v", "day"))
    assert(v1Read.count() === 3, "v1 readers must still see every generation")

    // v2 production reader over the full history: v1 files null-fill
    val v2 = v1.add(StructField("quality_flag", StringType))
    val v2Read = spark.read.schema(v2).parquet(path)
    assert(v2Read.count() === 3)
    assert(v2Read.filter(col("quality_flag").isNull).count() === 2)
  }
}
