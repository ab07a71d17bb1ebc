package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorExpressions

class DotProductSpec extends SparkSpec {
  import spark.implicits._

  test("codegen dot product equals the interpreted higher-order fold") {
    VectorExpressions.register(spark)
    val df = graft.sources.Tables.embeddings(spark, Sf)
      .withColumn("v", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
      .withColumn("fast", VectorExpressions.dot(col("v"), col("v")))
      .withColumn("slow", expr(
        "aggregate(zip_with(v, v, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"))
    // bit-identical, not just close: same fold order is the contract
    assert(df.filter(col("fast") =!= col("slow")).count() === 0)
  }

  test("null inputs propagate") {
    VectorExpressions.register(spark)
    val df = Seq((Some(Seq(1.0, 2.0)), Option.empty[Seq[Double]]))
      .toDF("a", "b")
      .select(VectorExpressions.dot(col("a"), col("b")).as("d"))
    assert(df.head().isNullAt(0))
  }

  test("known value") {
    VectorExpressions.register(spark)
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
      .select(VectorExpressions.dot(col("a"), col("b")).as("d"))
    assert(df.head().getDouble(0) === 32.0)
  }
}
