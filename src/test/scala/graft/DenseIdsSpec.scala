package graft

import graft.operators.Layout

/** q113's contract is stronger than "a correct row_number": the ids must
  * be a pure function of the KEY SET — stable under re-runs and under any
  * parallelism — and exactly dense. A zipWithIndex-style assignment
  * (partition-order dependent) satisfies neither; this pins that the
  * bucket/cumsum construction does.
  */
class DenseIdsSpec extends SparkSpec {

  private def ids(): Seq[(Long, Long)] =
    Layout.q113DenseIds(spark, Sf)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq

  test("ids are invariant under shuffle parallelism and exactly dense") {
    val key = "spark.sql.shuffle.partitions"
    val before = spark.conf.get(key)
    def at(n: Int): Seq[(Long, Long)] =
      try { spark.conf.set(key, n.toString); ids() }
      finally spark.conf.set(key, before)
    val a = at(2)
    val b = at(13)
    assert(a === b, "seq ids changed with shuffle partition count")
    // dense: 0..N-1 with no gaps, assigned in strictly increasing doc_id
    // order
    assert(a.map(_._2) === a.indices.map(_.toLong))
    assert(a.map(_._1) === a.map(_._1).sorted)
    assert(a.nonEmpty)
  }
}
