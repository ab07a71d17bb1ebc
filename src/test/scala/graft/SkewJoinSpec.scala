package graft

import org.apache.spark.sql.functions._
import graft.functions.SkewJoin
import graft.sources.Tables

class SkewJoinSpec extends SparkSpec {

  test("salted join equals the plain join (lineitem x supplier)") {
    val li = Tables.lineitem(spark, Sf)
    val sup = Tables.supplier(spark, Sf)
    val plain = li.join(sup, li("l_suppkey") === sup("s_suppkey"))
      .groupBy(col("s_name")).agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("q"))
    val salted = SkewJoin.saltedEquiJoin(
        li.withColumnRenamed("l_suppkey", "s_suppkey"), sup,
        keys = Seq("s_suppkey"), salts = 8, saltOn = Seq("l_orderkey", "l_linenumber"))
      .groupBy(col("s_name")).agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("q"))
    assert(plain.exceptAll(salted).count() === 0)
    assert(salted.exceptAll(plain).count() === 0)
  }

  test("small side fans out exactly salts-fold") {
    val small = Tables.supplier(spark, Sf)
    val big = Tables.lineitem(spark, Sf).withColumnRenamed("l_suppkey", "s_suppkey")
    val joined = SkewJoin.saltedEquiJoin(big, small, Seq("s_suppkey"), 4,
      Seq("l_orderkey", "l_linenumber"))
    // row count must equal the unsalted join's
    val plainCount = big.join(small, "s_suppkey").count()
    assert(joined.count() === plainCount)
  }
}
