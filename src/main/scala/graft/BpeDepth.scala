package graft

import org.apache.spark.sql.SparkSession

/** Bench-only BPE depth measurement (VERDICT-r8 #4): drive the shared
  * [[graft.operators.TextOps.bpeTrain]] loop far past the 5-round oracle
  * gate and record the per-round cost curve, so "thousands of rounds are
  * fine because each round is dictionary-sized" is a number, not an
  * argument. Audit mode asserts, every round, that the weighted symbol
  * count drops by exactly the merged pair's frequency; this main
  * additionally asserts the merge-frequency sequence is monotone
  * non-increasing (greedy BPE's structural invariant) and prints one
  * JSON line per round: round, pair, freq, seconds, weighted symbols.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> SPARK_GRAFT_BPE_ROUNDS=50 \
  *          runMain graft.BpeDepth
  */
object BpeDepth {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nRounds = sys.env.getOrElse("SPARK_GRAFT_BPE_ROUNDS", "50").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.util.Checkpoints.arm()
    // SPARK_GRAFT_BPE_LOCAL=1: the deep-merge tail — ONE Spark corpus
    // pass collects the dictionary, all rounds run driver-local
    // (identical pair-count + merge semantics; parity with the Spark
    // rounds asserted below over a shared prefix)
    val local = sys.env.get("SPARK_GRAFT_BPE_LOCAL").contains("1")
    val t0 = System.nanoTime()
    val merges = if (local) {
      val tDict = System.nanoTime()
      val dict = graft.operators.TextOps.bpeDictionary(spark, sfDir)
      println(s"""{"metric":"bpe_dict","rows":${dict.length},""" +
        s""""secs":${f"${(System.nanoTime() - tDict) / 1e9}%.1f"}}""")
      val out = graft.operators.TextOps.bpeTrainLocal(dict, nRounds,
        onRound = (r, a, b, freq, secs, syms) =>
          if (r <= 5 || r % 100 == 0)
            println(s"""{"round":$r,"a":${q(a)},"b":${q(b)},"freq":$freq,""" +
              s""""secs":${f"$secs%.4f"},"weighted_syms":$syms}"""))
      // parity: the Spark rounds must produce the IDENTICAL merge table
      // over a shared prefix (both engines, one semantics)
      val prefix = math.min(nRounds, sys.env.getOrElse("SPARK_GRAFT_BPE_PARITY", "10").toInt)
      if (prefix > 0) {
        val sparkMerges = graft.operators.TextOps.bpeTrain(spark, sfDir, prefix, audit = true)
        require(out.take(prefix) == sparkMerges,
          s"driver-local merges diverge from Spark rounds:\n${out.take(prefix)}\nvs\n$sparkMerges")
        println(s"""{"metric":"bpe_parity","rounds":$prefix,"equal":true}""")
      }
      out
    } else graft.operators.TextOps.bpeTrain(spark, sfDir, nRounds,
      audit = true,
      onRound = (r, a, b, freq, secs, syms) =>
        println(s"""{"round":$r,"a":${q(a)},"b":${q(b)},"freq":$freq,""" +
          s""""secs":${f"$secs%.2f"},"weighted_syms":$syms}"""))
    val total = (System.nanoTime() - t0) / 1e9
    // greedy BPE: the max-pair frequency can never increase round-over-round
    val freqs = merges.map(_._5)
    freqs.sliding(2).zipWithIndex.foreach {
      case (Seq(x, y), i) => require(x >= y,
        s"merge frequency rose at round ${i + 2}: $x -> $y")
      case _ => ()
    }
    val perRound = merges.map(_._5).size
    println(s"""{"metric":"bpe_depth","rounds":$perRound,""" +
      s""""total_sec":${f"$total%.1f"},""" +
      s""""monotone_freqs":true,"sf_dir":"$sfDir"}""")
    spark.stop()
  }

  private def q(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}
