package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}

import graft.operators.StatsJoin

/** q171 — the statistics catalog deciding the physical JOIN STRATEGY.
  * The pin brackets `spark.sql.autoBroadcastJoinThreshold` between the
  * CBO-estimated post-filter size of the error side (rowCount + value
  * histogram → FilterEstimation) and the raw parquet file size the
  * planner falls back to without statistics:
  *
  *   - stats-on: the STATIC plan (queryExecution.sparkPlan — before any
  *     AQE re-planning) is a BroadcastHashJoin with the filtered error
  *     side on the build side — the broadcast decided at PLAN time, no
  *     shuffle anywhere;
  *   - stats-off: the static plan is a SortMergeJoin — without column
  *     statistics a Filter does not shrink sizeInBytes, so the raw file
  *     size (above the threshold) is the only evidence and both sides
  *     pay their shuffle map stage before AQE could localize anything;
  *   - causality: stats-on with the threshold pinned BELOW the estimated
  *     filtered size also plans SortMergeJoin — it is the estimate
  *     crossing the threshold that flips the strategy, not the stats-cbo
  *     knob per se;
  *   - results are identical both ways (the strategy must not change the
  *     answer).
  *
  * The bracket premise (est < threshold < raw) is asserted from the
  * plan's own Filter statistics, not assumed.
  */
class StatsBroadcastSpec extends SparkSpec {

  private def withConfs[T](pairs: (String, String)*)(f: => T): T = {
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally pairs.foreach { case (k, _) => spark.conf.unset(k) }
  }

  /** ~1% of rows carry a value ≥ 200.00 (the q169-family threshold);
    * the rest sit far below it. Null users/values on independent
    * residues keep the population frames honest. */
  private def ev(ids: Range, day: Int, types: Seq[String]) = {
    import spark.implicits._
    ids.map { i =>
      (i.toLong, java.sql.Timestamp.valueOf(f"2024-04-$day%02d 10:00:00"),
        if (i % 11 == 0) None else Some((i % 40).toLong),
        types(i % types.size),
        if (i % 7 == 0) None
        else if (i % 101 == 0) Some(200.0 + i / 100.0)
        else Some((i % 997) / 20.0))
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
  }

  private def bhjBuildTables(plan: SparkPlan): Seq[String] = plan.collect {
    case j: BroadcastHashJoinExec =>
      val build = j.buildSide match {
        case org.apache.spark.sql.catalyst.optimizer.BuildLeft => j.left
        case org.apache.spark.sql.catalyst.optimizer.BuildRight => j.right
      }
      build.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.tableIdentifier.map(_.table).getOrElse("")
      }
  }.flatten

  private def smjCount(plan: SparkPlan): Int =
    plan.collect { case j: SortMergeJoinExec => j }.size

  /** The Filter-over-error node's CBO size estimate in the optimized
    * plan (the statistic JoinSelection consumes). */
  private def filteredErrorEstBytes(df: DataFrame): BigInt =
    df.queryExecution.optimizedPlan.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
          if f.collectLeaves().exists {
            case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
              r.catalogTable.exists(_.identifier.table.contains("error"))
            case _ => false
          } => f.stats.sizeInBytes
    }.min

  test("q171: stats-on plans a plan-time broadcast of the filtered side; " +
      "stats-off plans a sort-merge join off raw file sizes; " +
      "a threshold below the estimate flips stats-on back to SMJ; " +
      "results identical throughout") {
    val dir = TempDirs.create("graft_bcast_corp")
    // THREE types (not two): with types(i % 2) the error rows would all
    // carry even user ids and the view rows odd ones — an empty join
    (ev(0 until 6000, 1, Seq("error", "signup", "view")) unionByName
      ev(6000 until 12000, 2, Seq("error", "signup", "view")))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    withConfs(
      "spark.graft.kmv.tableDir" -> TempDirs.create("graft_bcast_tbl"),
      "spark.graft.evlayout.dir" -> TempDirs.create("graft_bcast_layout")) {
      try {
        StatsJoin.clearMemo()
        // land layout + stats once (default threshold), then compute the
        // bracket from the artifacts themselves. The estimate read runs
        // under a cbo-on PARENT conf: LogicalPlan.stats consulted from
        // the spec thread resolves SQLConf against the ACTIVE session
        // (the q169 pin's convention) — only plan phases inside the
        // child's QueryExecution see the child conf.
        val probe = StatsJoin.q171StatsBroadcast(spark, dir)
        val est = withConfs("spark.sql.cbo.enabled" -> "true") {
          filteredErrorEstBytes(StatsJoin.q171StatsBroadcast(spark, dir))
        }
        val rawBytes = {
          val conf = spark.sparkContext.hadoopConfiguration
          probe.queryExecution.analyzed.collect {
            case r: org.apache.spark.sql.execution.datasources.LogicalRelation
                if r.catalogTable.exists(_.identifier.table.contains("error")) =>
              r.catalogTable.get.identifier.table
          }.distinct.map { t =>
            spark.table(t).inputFiles.map { f =>
              val p = new org.apache.hadoop.fs.Path(f)
              p.getFileSystem(conf).getFileStatus(p).getLen
            }.sum
          }.sum
        }
        assert(est.toLong < rawBytes,
          s"bracket premise: estimated filtered size ($est) must sit " +
            s"below the raw file size ($rawBytes)")
        val threshold = (est.toLong + rawBytes) / 2
        val (onPlan, rowsOn) = withConfs(
          "spark.sql.autoBroadcastJoinThreshold" -> threshold.toString) {
          val d = StatsJoin.q171StatsBroadcast(spark, dir)
          (d.queryExecution.sparkPlan, d.collect().toSeq)
        }
        assert(rowsOn.nonEmpty)
        assert(bhjBuildTables(onPlan).exists(_.contains("error")),
          s"stats-on must broadcast the filtered error side at plan " +
            s"time, got:\n$onPlan")
        assert(smjCount(onPlan) === 0,
          s"stats-on must not shuffle either side, got:\n$onPlan")
        val (offPlan, rowsOff) = withConfs(
          "spark.sql.autoBroadcastJoinThreshold" -> threshold.toString,
          "spark.graft.stats.cbo" -> "false") {
          val d = StatsJoin.q171StatsBroadcast(spark, dir)
          (d.queryExecution.sparkPlan, d.collect().toSeq)
        }
        assert(smjCount(offPlan) >= 1 && bhjBuildTables(offPlan).isEmpty,
          s"stats-off must fall back to a sort-merge join (raw file " +
            s"size $rawBytes > threshold $threshold), got:\n$offPlan")
        assert(rowsOn === rowsOff, "the strategy must not change the result")
        // causality: same statistics, threshold well below the estimate
        // (est is the Filter node's size; the join child is a narrower
        // Project, ~half of it — /100 clears the bracket) — the
        // estimate crossing the threshold is what flips the plan
        val underPlan = withConfs(
          "spark.sql.autoBroadcastJoinThreshold" -> (est / 100).toString) {
          StatsJoin.q171StatsBroadcast(spark, dir).queryExecution.sparkPlan
        }
        assert(smjCount(underPlan) >= 1 && bhjBuildTables(underPlan).isEmpty,
          s"a threshold below the estimate must refuse the broadcast, " +
            s"got:\n$underPlan")
      } finally {
        graft.plans.SynopsisStats.clearRefresh()
        StatsJoin.clearMemo()
      }
    }
  }

  /** sf10 replica (built by measure scripts at /tmp/sf10): at the
    * DEFAULT 10 MB threshold the bracket holds naturally — ~190k
    * estimated post-filter rows (~6 MB) vs a raw error table well past
    * 10 MB — so production defaults get the plan-time broadcast with no
    * tuning. Cancelled when the replica is absent. */
  test("q171 at sf10: default threshold broadcasts stats-on, " +
      "sort-merges stats-off") {
    assume(new java.io.File("/tmp/sf10/events.parquet").exists(),
      "sf10 replica not built")
    try {
      StatsJoin.clearMemo()
      val on = StatsJoin.q171StatsBroadcast(spark, "/tmp/sf10")
        .queryExecution.sparkPlan
      assert(bhjBuildTables(on).exists(_.contains("error")) &&
        smjCount(on) === 0,
        s"sf10 stats-on must plan the broadcast at the default " +
          s"threshold, got:\n$on")
      val off = withConfs("spark.graft.stats.cbo" -> "false") {
        StatsJoin.q171StatsBroadcast(spark, "/tmp/sf10")
          .queryExecution.sparkPlan
      }
      assert(smjCount(off) >= 1 && bhjBuildTables(off).isEmpty,
        s"sf10 stats-off must sort-merge at the default threshold, " +
          s"got:\n$off")
    } finally {
      graft.plans.SynopsisStats.clearRefresh()
      StatsJoin.clearMemo()
    }
  }
}
