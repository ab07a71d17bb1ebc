package graft

import graft.operators.VectorOps

/** The ANN quality contract (q81): recall@k of each approximate index
  * against the brute-force truth, with a floor each index must clear —
  * hash-determinism alone would let a recall-0.2 index pass the oracle
  * gate (and did: the original single-table LSH measured recall 0 here).
  * Floors sit below the measured values (IVF with T=3 learned centroids
  * 0.80/0.84/0.575, LSH 0.60/0.63/0.56, and near-dup pair recall
  * 0.55/0.54/0.63 at sf0.001/0.01/0.1 — IVF's fraction shrinks as
  * nprobe/cells does) with margin for corpus drift, but far above
  * "broken".
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

  /** The B(N) rule (`VectorOps.lshBitsFor`), gated from both sides: the
    * rule must resolve to the oracle's pinned B=8 at every test scale
    * (that resolution is what makes the static DuckDB oracle valid), and
    * recall must clear a floor at the rule's value while an OVERSHARDED
    * width (B=12 at N=500 — 13× more buckets than vectors) demonstrably
    * costs recall. That asymmetry is the rule: too-small B costs runtime
    * (buckets grow with N — the sf1 measurement), too-large B costs
    * recall, so B must track log N.
    */
  test("B(N) resolves to the oracle's floor; recall gated at B=8 and oversharded B=12") {
    import org.apache.spark.sql.functions._
    // THE GUARD the static oracles depend on: q49/q89/q81 derive B from
    // the corpus count at runtime while their DuckDB oracles pin
    // B = DefaultLshBits — if the driver's verify/bench corpora ever grow
    // past the floor's range, this must fail in CI before the oracle
    // mismatch shows up as a phantom engine bug. Checked against the
    // ACTUAL corpora, not assumed row counts.
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val n = graft.sources.Tables.embeddings(spark, s"/root/testdata/$sf").count()
      assert(VectorOps.lshBitsFor(n) === VectorOps.DefaultLshBits,
        s"$sf ($n vectors) no longer resolves to the pinned oracle B — regenerate the oracles")
    }
    // the rule's growth shape beyond the floor
    assert(VectorOps.lshBitsFor(50000) === 11, "the PLANS §sf1 design case")
    assert(VectorOps.lshBitsFor(100000000L) === 22)

    val truth3 = VectorOps.q48KnnCosine(spark, Sf).filter(col("rank") <= 3)
      .select(col("q_id"), col("b_id")).localCheckpoint()
    val nq = truth3.select(col("q_id")).distinct().count()
    def recallAt(bits: Int): Double =
      VectorOps.q49AnnLshAt(spark, Sf, bits)
        .select(col("q_id"), col("b_id"))
        .join(truth3, Seq("q_id", "b_id")).count().toDouble / (nq * 3)
    val r8 = recallAt(8)
    val r12 = recallAt(12)
    info(f"recall@3: B=8 $r8%.3f, B=12 $r12%.3f")
    assert(r8 >= 0.5, s"recall at the rule's width degraded: $r8")
    assert(r12 < r8, s"oversharded B should cost recall here: B8=$r8 B12=$r12")
  }
}
