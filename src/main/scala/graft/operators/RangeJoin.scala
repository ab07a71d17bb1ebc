package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Binned range join: `fact.ts BETWEEN interval.start AND interval.end`
  * as an EQUI-join on fixed-width time bins — the 1-D analogue of the
  * grid-cell spatial join (q62) and the same pigeonhole argument:
  *
  *  - each fact row owns exactly ONE bin (`floor(µs / binWidth)`);
  *  - each interval explodes to every bin it overlaps
  *    (`sequence(bin(start), bin(end))` — `len/bin + 2` rows max);
  *  - a qualifying (fact, interval) pair always meets in the fact's own
  *    bin, and only there → no lost or duplicated matches; the exact
  *    BETWEEN post-filter removes same-bin non-matches.
  *
  * Spark's own planner turns a plain BETWEEN join into a broadcast
  * nested loop (fine while intervals broadcast) or a cartesian product
  * (fatal at scale). The binned form shuffles each side by bin once —
  * state O(facts + intervals·bins), never O(facts·intervals). Pick
  * `binMicros` ≈ the typical interval length: shorter bins explode the
  * interval side, longer bins pack more non-matches into a bin for the
  * post-filter to discard.
  */
object RangeJoin {

  def binnedRangeJoin(facts: DataFrame, tsCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      binMicros: Long): DataFrame = {
    require(binMicros > 0)
    val f = facts.withColumn("__bin",
      floor(unix_micros(col(tsCol)).cast("double") / binMicros).cast("long"))
    val iv = intervals.withColumn("__bin", explode(sequence(
      floor(unix_micros(col(startCol)).cast("double") / binMicros).cast("long"),
      floor(unix_micros(col(endCol)).cast("double") / binMicros).cast("long"))))
    f.join(iv, "__bin")
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("__bin")
  }
}
