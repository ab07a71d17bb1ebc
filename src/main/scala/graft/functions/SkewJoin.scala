package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted-join helper for skewed keys (the manual fallback when AQE's
  * skew-join split can't apply, e.g. bucketed tables or non-shuffle
  * joins).
  *
  * Standard salting: the skewed (large) side gets a random-ish salt in
  * [0, n); the small side is exploded n× with every salt value; the join
  * adds the salt to the key so one hot key fans out over n reducers.
  * Salt here is `pmod(hash(cols), n)` — deterministic, so results are
  * reproducible and the helper stays usable under the oracle gate.
  */
object SkewJoin {

  /** Inner equi-join of `big` (skewed) with `small` on `keys`, salted n
    * ways. Output columns = the usual join output (salt dropped).
    */
  def saltedEquiJoin(big: DataFrame, small: DataFrame,
      keys: Seq[String], salts: Int, saltOn: Seq[String]): DataFrame = {
    require(salts > 0)
    val salted = big.withColumn("__salt",
      pmod(hash(saltOn.map(col): _*), lit(salts)))
    val exploded = small.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    salted.join(exploded, keys :+ "__salt").drop("__salt")
  }
}
