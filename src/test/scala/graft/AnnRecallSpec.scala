package graft

import graft.operators.VectorOps

/** The ANN quality contract (q81): recall@k of each approximate index
  * against the brute-force truth, with a floor each index must clear —
  * hash-determinism alone would let a recall-0.2 index pass the oracle
  * gate (and did: the original single-table LSH measured recall 0 here).
  * Floors sit below the measured values (IVF 0.70/0.90/0.62, LSH
  * 0.60/0.63/0.56, and near-dup pair recall 0.55/0.54/0.63 at
  * sf0.001/0.01/0.1 — IVF's fraction shrinks as nprobe/cells does) with
  * margin for corpus drift, but far above "broken".
  */
class AnnRecallSpec extends SparkSpec {

  test("IVF recall@5 ≥ 0.6, multiprobe LSH recall@3 ≥ 0.5, near-dup pair recall ≥ 0.5") {
    // one q81 run covers all three floors — the pipeline recomputes two
    // brute-force truth scans, so don't run it once per assertion
    val rows = VectorOps.q81AnnRecall(spark, Sf).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(rows.keySet === Set("ivf", "lsh", "neardup"), rows)
    assert(rows("ivf") >= 0.6, s"IVF recall@5 degraded: ${rows("ivf")}")
    assert(rows("lsh") >= 0.5, s"LSH recall@3 degraded: ${rows("lsh")}")
    assert(rows("neardup") >= 0.5, s"near-dup pair recall degraded: ${rows("neardup")}")
  }
}
