package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{JoinSynopsis, KeySynopsis}

/** r10 verdict #4: `JoinSynopsis.joinEst` accumulated Σ f_A·f_B as
  * Long — at the 100 TB frequencies the synopsis targets (hot keys
  * ~10⁹–10¹⁰) a SINGLE product reaches 10²⁰, wrapping negative and
  * feeding a silently wrong estimate into a broadcast decision. The
  * estimator now computes each product and the sum in Double; this
  * suite pins, at exactly the adversarial scale from the verdict
  * (frequencies ~10¹⁰, 64 matched keys), that the estimate is finite,
  * positive, and equal to the BigInt-exact computation within FP
  * tolerance — plus the old failure mode as a regression witness
  * (the exact value no Long accumulation could represent). Pure
  * driver-side arithmetic: no SparkSession.
  */
class JoinSynopsisOverflowSpec extends AnyFunSuite {

  private val K = JoinSynopsis.K

  /** Deterministic fake "md5" hashes: 32 lowercase hex chars, ordered. */
  private def hexHash(i: Int): String = f"$i%08x" + "ef" * 12

  /** BigInt/BigDecimal reference: same formula, exact product sum. */
  private def exactEst(a: KeySynopsis, b: KeySynopsis): BigDecimal = {
    val ka = a.kept.map(_._1).toSet
    val kb = b.kept.map(_._1).toSet
    val ku = (ka ++ kb).toVector.sorted.take(K)
    val fa = a.kept.toMap
    val fb = b.kept.toMap
    val psum = ku.iterator.collect {
      case h if ka(h) && kb(h) => BigInt(fa(h)) * BigInt(fb(h))
    }.sum
    val unionEst =
      if (ku.size < K) BigDecimal(ku.size)
      else {
        val u = math.max(
          java.lang.Long.parseLong(ku.last.substring(0, 12), 16), 1L)
        BigDecimal(K - 1) * BigDecimal(281474976710656L) / BigDecimal(u)
      }
    unionEst / BigDecimal(ku.size) * BigDecimal(psum)
  }

  test("10^10-frequency synopses: finite, positive, BigInt-exact within FP tolerance") {
    val rnd = new scala.util.Random(20260815L)
    for (trial <- 1 to 50) {
      // saturated synopses over a SHARED key universe so all 64 union
      // keys are matched — the worst-case product count
      val hashes = (1 to K).map(i => hexHash(i * 7 + trial)).sorted
      def syn(name: String): KeySynopsis = {
        val kept = hashes.map { h =>
          // 10^9..2*10^10 — every single product overflows Long
          h -> (1000000000L + (rnd.nextLong(19000000000L)))
        }.toVector
        KeySynopsis(name, kept.map(_._2).sum, K, kept)
      }
      val (a, b) = (syn("a"), syn("b"))
      val est = JoinSynopsis.joinEst(a, b)
      assert(java.lang.Double.isFinite(est), s"trial $trial: non-finite $est")
      assert(est > 0, s"trial $trial: non-positive $est (Long wrap symptom)")
      val exact = exactEst(a, b)
      val rel = ((BigDecimal(est) - exact) / exact).abs
      assert(rel < BigDecimal("1e-12"),
        s"trial $trial: est $est vs exact $exact (rel $rel)")
    }
  }

  test("regression witness: the wrapped-Long estimate would have been negative") {
    // 64 matched keys, each product 4*10^20 ≈ 43×Long.MaxValue: the sum
    // under Long arithmetic is provably unrepresentable; the Double path
    // must land on ~64 * 4e20 scaled by the union factor
    val hashes = (1 to K).map(hexHash).sorted
    val kept = hashes.map(_ -> 20000000000L).toVector // 2*10^10
    val s = KeySynopsis("s", kept.map(_._2).sum, K, kept)
    val longProduct = 20000000000L * 20000000000L // wrapped
    assert(longProduct < 0, "fixture must actually overflow Long")
    val est = JoinSynopsis.joinEst(s, s)
    assert(java.lang.Double.isFinite(est) && est > 0)
    val exact = exactEst(s, s)
    assert(((BigDecimal(est) - exact) / exact).abs < BigDecimal("1e-12"))
  }
}
