package graft

import graft.operators.TextOps

/** The driver-local BPE tail (the deep-merge crossover, PLANS §r9) must
  * be the SAME algorithm as the Spark rounds: identical pair counting
  * (every adjacent position, overlapping included), identical greedy
  * non-overlapping merge, identical freq-DESC/(a,b)-UTF8-ascending
  * tie-break — asserted by merge-table equality over real gate data and
  * over the fixtures whose tables are hand-derived in BpeSpec.
  */
class BpeLocalSpec extends SparkSpec {

  test("driver-local rounds produce the identical merge table to Spark rounds") {
    val n = 12
    val local = TextOps.bpeTrainLocal(TextOps.bpeDictionary(spark, Sf), n)
    val dist = TextOps.bpeTrain(spark, Sf, n)
    assert(local === dist)
  }

  test("local greedy merge is non-overlapping left-to-right (the aaaa pin)") {
    // dictionary: 'aaaa' x3 + 'ab' — same fixture as BpeSpec's greedy pin
    val dict = Array(
      (3L, Array("a", "a", "a", "a")),
      (1L, Array("a", "b")))
    val out = TextOps.bpeTrainLocal(dict, 5)
    assert(out === Seq(
      (1, "a", "a", "aa", 9L),   // 3 adjacencies x cnt 3
      (2, "aa", "aa", "aaaa", 3L), // non-overlapping merge left aa|aa
      (3, "a", "b", "ab", 1L)))  // then exhaustion stops the loop
  }

  test("local symbol bookkeeping matches the merge frequencies") {
    val dict = TextOps.bpeDictionary(spark, Sf)
    val before = dict.map { case (c, ss) => c * ss.length }.sum
    var last = before
    TextOps.bpeTrainLocal(dict, 8, onRound = (_, _, _, freq, _, syms) => {
      assert(last - syms === freq)
      last = syms
    })
  }
}
