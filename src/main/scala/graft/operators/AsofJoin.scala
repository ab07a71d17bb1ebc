package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic scalable as-of join: for each left row, the latest right row
  * with `rightTs <= leftTs` (per key), optionally within a tolerance —
  * the feature-join primitive of every training pipeline ("the newest
  * signal known at example time", leak-free by construction).
  *
  * Construction is the union trick, NOT a join: tag both sides, union,
  * sort per key by (ts, side) with right rows ordered before left rows at
  * equal ts (an exactly-at-example-time feature IS known at example
  * time), then `last_value(ignoreNulls)` over rows-unbounded-preceding
  * carries the most recent right payload forward onto each left row.
  *
  * Scale: ONE shuffle on the key (the window partition), zero join
  * explosion — where a naive `leftTs >= rightTs` non-equi join is a
  * per-key cartesian that Spark plans as BNLJ. State per key is a single
  * carried value, and the window is rows-based so no range scan. The J3
  * weather accuracy join (q23) keeps the reference's hour-bucketed
  * semantics; this operator is the general-offset form (q75).
  */
object AsofJoin {

  /** `left` gains `matchedTs` + `payloadCols` from the latest prior right
    * row per `keys`; rows with no prior right row (or outside
    * `toleranceMicros`, if set) get NULLs.
    */
  def nearestPrior(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payloadCols: Seq[String],
      toleranceMicros: Option[Long] = None,
      rightTieCol: Option[String] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    // tag: right rows sort before left rows at equal ts (side 0 < 1);
    // rightTieCol gives ties among right rows at the same instant a total
    // order (the highest tie value wins) — without it, equal-ts right rows
    // carry a nondeterministic winner
    val tieOf = (df: DataFrame, c: Option[String]) =>
      c.map(n => df(n).cast("long")).getOrElse(lit(0L))
    val l = left.withColumn("__side", lit(1))
      .withColumn("__ts", col(leftTs))
      .withColumn("__tie", lit(0L))
      .withColumn("__rts", lit(null).cast("timestamp"))
    val payloadNull = payloadCols.foldLeft(l)((df, c) =>
      df.withColumn(s"__p_$c", lit(null).cast(right.schema(c).dataType)))
    val r = payloadCols.foldLeft(
      right.withColumn("__side", lit(0))
        .withColumn("__ts", col(rightTs))
        .withColumn("__tie", tieOf(right, rightTieCol))
        .withColumn("__rts", col(rightTs)))((df, c) => df.withColumn(s"__p_$c", col(c)))
      .select(keys.map(col) ++ Seq(col("__side"), col("__ts"), col("__tie"), col("__rts")) ++
        payloadCols.map(c => col(s"__p_$c")) ++
        leftCols.filterNot(keys.contains).map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)

    val unioned = payloadNull.select(
      keys.map(col) ++ Seq(col("__side"), col("__ts"), col("__tie"), col("__rts")) ++
        payloadCols.map(c => col(s"__p_$c")) ++
        leftCols.filterNot(keys.contains).map(col): _*)
      .unionByName(r)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // carry the whole right row ATOMICALLY (one struct): separate last()
    // per column could mix different right rows when a payload is NULL
    val rightStruct = when(col("__side") === 0,
      struct(col("__rts").as("rts") +: payloadCols.map(c => col(s"__p_$c").as(c)): _*))
    val withCarry = unioned
      .withColumn("__r", last(rightStruct, ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val inTol = toleranceMicros match {
      case Some(t) => unix_micros(col("__ts")) - unix_micros(col("__r.rts")) <= t
      case None => lit(true)
    }
    withCarry
      .withColumn("__ok", col("__r").isNotNull && inTol)
      .select(leftCols.map(col) ++
        Seq(when(col("__ok"), col("__r.rts")).as("matched_ts")) ++
        payloadCols.map(c => when(col("__ok"), col(s"__r.$c")).as(s"asof_$c")): _*)
  }
}
