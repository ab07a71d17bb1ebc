package graft

import org.apache.spark.sql.SparkSession

/** The session profile this library's plans are designed around on a real
  * cluster (the 100 TB / 1000-executor posture README documents). Local
  * harnesses (Verify/Bench/tests) set their own small values; a deployment
  * calls `Conf.production(builder, coresTotal)` so the optimizer-facing
  * knobs match the plan shapes the suite verifies:
  *
  *  - AQE on, with partition coalescing and skew-join splitting — the
  *    first line of defense before manual salting (AqeSkewSpec shows the
  *    runtime skew split; `SkewJoin.saltedEquiJoin` is the manual
  *    fallback for pathological keys);
  *  - `shuffle.partitions` ≈ 2× total cores as the AQE UPPER bound — AQE
  *    coalesces down to ~64 MB targets, so oversizing is cheap and
  *    undersizing (the default 200 on a 32k-core cluster) is fatal;
  *  - 256 MB scan splits — large enough to amortize parquet footer reads
  *    on wide tables, small enough that a straggler split rebalances;
  *  - 64 MB broadcast threshold — every dimension table in the suite
  *    (stations, postal centroids, nation/region/supplier) broadcasts at
  *    any SF, which is what keeps the fact side shuffle-free in the
  *    flagship plans (PLANS.md);
  *  - UTC session timezone — part of the determinism contract every
  *    oracle in this repo is validated under;
  *  - [[GraftExtensions]] — the SQL function surface plus the automatic
  *    radius-join → grid-join rewrite.
  */
object Conf {

  def production(b: SparkSession.Builder, coresTotal: Int): SparkSession.Builder = {
    require(coresTotal > 0, s"coresTotal must be positive, got $coresTotal")
    b.config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.shuffle.partitions", (coresTotal * 2L).toString)
      .config("spark.sql.files.maxPartitionBytes", (256L << 20).toString)
      .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // both registration paths: the conf string serves spark-submit /
      // cluster-default setups, but it is a STATIC conf — ignored when a
      // SparkContext already exists (e.g. embedding into a running app) —
      // so the builder-level injection covers that case too
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .withExtensions(new GraftExtensions)
  }
}
