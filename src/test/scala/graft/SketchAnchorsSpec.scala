package graft

import org.apache.spark.sql.DataFrame

import graft.operators.{KmvTable, Layout}

/** `spark.graft.sketch.anchors=false` — the PRODUCTION shape of the
  * sketch family (r9 verdict #1): the exact-anchor columns exist only
  * so the DuckDB gate can hash-verify the estimates, and the anchors-off
  * mode must (a) drop exactly those columns, (b) leave every sketch
  * estimate IDENTICAL to the anchored run's (same kept sets → same
  * estimator values), and (c) for the table-served queries
  * (q146/q148/q151) never scan the events feed at all when the
  * maintained sketch table is fresh — the "one pass EVER" posture as a
  * plan pin, not prose.
  */
class SketchAnchorsSpec extends SparkSpec {

  private val AnchorCols = Set("n_rows", "n_distinct", "n_exact", "rel_err",
    "n_a", "n_b", "n_inter", "n_union", "jaccard_exact", "union_rel_err",
    "n_join_exact", "n_exact", "x_pop", "x_in", "x_sel", "sel_err")

  private def anchorsOff[T](f: => T): T = {
    spark.conf.set("spark.graft.sketch.anchors", "false")
    try f finally spark.conf.unset("spark.graft.sketch.anchors")
  }

  private def withTableDir[T](f: => T): T = {
    spark.conf.set("spark.graft.kmv.tableDir", TempDirs.create("graft_anch_tbl"))
    try f finally spark.conf.unset("spark.graft.kmv.tableDir")
  }

  /** Every file-source root path in the OPTIMIZED logical plan — the
    * physical plan is AQE-wrapped (AdaptiveSparkPlanExec has no
    * children), which would make a collectLeaves-based pin vacuously
    * pass; the logical relations are what the scan set actually is.
    */
  private def scanPaths(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        r.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.rootPaths.map(_.toString)
          case _ => Seq.empty[String]
        }
    }.flatten

  private def estMap(df: DataFrame, est: String, keys: String*) =
    df.collect().map { r =>
      keys.map(k => r.get(r.fieldIndex(k)).toString).mkString("|") ->
        r.getDouble(r.fieldIndex(est))
    }.toMap

  test("q139/q152: anchors-off drops exact columns, estimates identical") {
    val on = Layout.q139KmvDistinct(spark, Sf)
    val off = anchorsOff(Layout.q139KmvDistinct(spark, Sf))
    assert(off.columns.toSet.intersect(AnchorCols) === Set.empty)
    assert(estMap(off, "kmv_estimate", "event_type") ===
      estMap(on, "kmv_estimate", "event_type"))

    val on152 = Layout.q152ApproxRewrite(spark, Sf).collect()
      .map(r => r.getString(0) -> r.getLong(r.fieldIndex("n_approx"))).toMap
    val off152 = anchorsOff(Layout.q152ApproxRewrite(spark, Sf)).collect()
      .map(r => r.getString(0) -> r.getLong(r.fieldIndex("n_approx"))).toMap
    assert(off152 === on152)
  }

  test("q146/q151/q148/q161: fresh table => no events scan, estimates identical") {
    withTableDir {
      // prime the maintained table (this pass scans the feed — once)
      KmvTable.maintain(spark, Sf).count()
      val before = KmvTable.filesScanned.get()

      val on146 = Layout.q146KmvRolling(spark, Sf)
      val on151 = KmvTable.q151KmvMaintain(spark, Sf)
      val on148 = Layout.q148KmvAlgebra(spark, Sf)
      val (off146, off151, off148, off161, off163, off164, off165, off166,
          off157, off158, off168, off162) =
        anchorsOff {
          (Layout.q146KmvRolling(spark, Sf),
           KmvTable.q151KmvMaintain(spark, Sf),
           Layout.q148KmvAlgebra(spark, Sf),
           Layout.q161QuantileRolling(spark, Sf),
           Layout.q163QuantileDrift(spark, Sf),
           Layout.q164RangeSelectivity(spark, Sf),
           KmvTable.q165TableStats(spark, Sf),
           KmvTable.q166KeyStats(spark, Sf),
           Layout.q157JoinSizeEst(spark, Sf),
           Layout.q158SynopsisOrder(spark, Sf),
           Layout.q168TableHistogram(spark, Sf),
           Layout.q162SelfJoinMoment(spark, Sf))
        }
      assert(KmvTable.filesScanned.get() === before,
        "maintenance against a fresh table must scan zero feed files")

      // the plan pin: anchors-off table-served queries read ONLY the
      // sketch table — the events feed appears nowhere in their scans
      // (q161/q163 joined the set in r11: their daily samples now live
      // in the maintained table's smp column, same one-scan pass)
      Seq("q146" -> off146, "q151" -> off151, "q148" -> off148,
          "q161" -> off161, "q163" -> off163, "q164" -> off164,
          "q165" -> off165, "q166" -> off166,
          "q157" -> off157, "q158" -> off158,
          "q168" -> off168, "q162" -> off162).foreach {
        case (name, df) =>
          val feed = scanPaths(df).filter(_.contains("events.parquet"))
          assert(feed.isEmpty, s"$name anchors-off plan scans the feed: $feed")
          assert(df.columns.toSet.intersect(AnchorCols) === Set.empty)
      }
      // anchored runs DO scan the feed (the anchor is the cost)
      assert(scanPaths(on146).exists(_.contains("events.parquet")))

      // estimator parity: same kept sets, same values
      assert(estMap(off146, "kmv_estimate", "event_type", "d") ===
        estMap(on146, "kmv_estimate", "event_type", "d"))
      assert(estMap(off151, "kmv_estimate", "event_type", "d") ===
        estMap(on151, "kmv_estimate", "event_type", "d"))
      assert(estMap(off148, "union_est", "type_a", "type_b") ===
        estMap(on148, "union_est", "type_a", "type_b"))
      assert(estMap(off148, "jaccard_est", "type_a", "type_b") ===
        estMap(on148, "jaccard_est", "type_a", "type_b"))
      // q161/q163 parity in the fresh-table regime too (the table-
      // served daily samples must feed both modes identically)
      val on161 = Layout.q161QuantileRolling(spark, Sf)
      def q161Map(df: DataFrame) = df.collect().map { r =>
        (r.getString(r.fieldIndex("event_type")),
          r.get(r.fieldIndex("d")).toString,
          r.getDouble(r.fieldIndex("p"))) ->
          r.getLong(r.fieldIndex("q_est"))
      }.toMap
      assert(q161Map(off161) === q161Map(on161))
      val on163 = Layout.q163QuantileDrift(spark, Sf)
      def q163Map(df: DataFrame) = df.collect().map { r =>
        (r.getString(r.fieldIndex("event_type")),
          r.getDouble(r.fieldIndex("p"))) ->
          r.getLong(r.fieldIndex("shift_est"))
      }.toMap
      assert(q163Map(off163) === q163Map(on163))
      val on164 = Layout.q164RangeSelectivity(spark, Sf)
      def q164Map(df: DataFrame) = df.collect().map { r =>
        r.getString(r.fieldIndex("event_type")) ->
          (r.getLong(r.fieldIndex("n_kept")), r.getLong(r.fieldIndex("n_in")))
      }.toMap
      assert(q164Map(off164) === q164Map(on164))
      // q165: the table-merged statistics (exact by construction) and
      // the NDV estimate agree across modes — and against the anchored
      // run's FEED-exact columns (x_rows/x_min/x_max == table's values)
      val on165 = KmvTable.q165TableStats(spark, Sf)
      def q165Map(df: DataFrame) = df.collect().map { r =>
        r.getString(r.fieldIndex("event_type")) ->
          ((r.getLong(r.fieldIndex("n_pop")), r.getLong(r.fieldIndex("vmin")),
            r.getLong(r.fieldIndex("vmax")),
            r.getDouble(r.fieldIndex("ndv_est"))))
      }.toMap
      assert(q165Map(off165) === q165Map(on165))
      on165.collect().foreach { r =>
        assert(r.getLong(r.fieldIndex("n_pop")) ===
          r.getLong(r.fieldIndex("x_rows")))
        assert(r.getLong(r.fieldIndex("vmin")) ===
          r.getLong(r.fieldIndex("x_min")))
        assert(r.getLong(r.fieldIndex("vmax")) ===
          r.getLong(r.fieldIndex("x_max")))
      }
      // q166: key-tier statistics agree across modes, and the anchored
      // run's feed-exact columns equal the table-merged ones
      val on166 = KmvTable.q166KeyStats(spark, Sf)
      def q166Map(df: DataFrame) = df.collect().map { r =>
        r.getString(r.fieldIndex("event_type")) ->
          ((r.getLong(r.fieldIndex("n_keys")), r.getLong(r.fieldIndex("umin")),
            r.getLong(r.fieldIndex("umax")),
            r.getLong(r.fieldIndex("f_kept_sum")),
            r.getDouble(r.fieldIndex("ndv_est"))))
      }.toMap
      assert(q166Map(off166) === q166Map(on166))
      on166.collect().foreach { r =>
        assert(r.getLong(r.fieldIndex("n_keys")) ===
          r.getLong(r.fieldIndex("x_keys")))
        assert(r.getLong(r.fieldIndex("umin")) ===
          r.getLong(r.fieldIndex("x_umin")))
        assert(r.getLong(r.fieldIndex("umax")) ===
          r.getLong(r.fieldIndex("x_umax")))
      }
      // q157/q158 joined the table-served family this round: the
      // anchors-off estimate (table-merged frequency kept sets) must
      // equal the anchored one (feed-built kept sets) — the
      // JoinSynopsisTableSpec equality law through the actual queries —
      // and the schedule it implies must be the same schedule
      val on157 = Layout.q157JoinSizeEst(spark, Sf)
      assert(estMap(off157, "join_est", "type_a", "type_b") ===
        estMap(on157, "join_est", "type_a", "type_b"))
      val on158 = Layout.q158SynopsisOrder(spark, Sf)
      def rankMap(df: DataFrame) = df.collect().map { r =>
        (r.getString(r.fieldIndex("type_a")), r.getString(r.fieldIndex("type_b"))) ->
          r.getInt(r.fieldIndex("est_rank"))
      }.toMap
      assert(rankMap(off158) === rankMap(on158))
      // q162 joined the table-served family this round (format-4 kss):
      // the anchors-off F₂ estimate (table-merged SALTED kept sets)
      // must equal the anchored one (feed-built salted kept sets) —
      // the downward-closure merge law over the salted hash, through
      // the actual query
      val on162 = Layout.q162SelfJoinMoment(spark, Sf)
      def q162Map(df: DataFrame) = df.collect().map { r =>
        r.getString(r.fieldIndex("event_type")) ->
          ((r.getLong(r.fieldIndex("n_kept")),
            r.getLong(r.fieldIndex("sum_f2_kept")),
            r.getDouble(r.fieldIndex("d_est")),
            r.getDouble(r.fieldIndex("f2_est"))))
      }.toMap
      assert(q162Map(off162) === q162Map(on162))
      // q168: the histogram bins (counts + spans + claimed mass) agree
      // across modes — same merged sample either way
      val on168 = Layout.q168TableHistogram(spark, Sf)
      def q168Map(df: DataFrame) = df.collect().map { r =>
        (r.getString(r.fieldIndex("event_type")), r.getInt(r.fieldIndex("bin"))) ->
          ((r.getLong(r.fieldIndex("n_bin")), r.getLong(r.fieldIndex("lo")),
            r.getLong(r.fieldIndex("hi")),
            r.getDouble(r.fieldIndex("est_sel"))))
      }.toMap
      assert(q168Map(off168) === q168Map(on168))
    }
  }

  test("q157: anchors-off drops the key join, join_est identical") {
    val on = Layout.q157JoinSizeEst(spark, Sf)
    val off = anchorsOff(Layout.q157JoinSizeEst(spark, Sf))
    assert(off.columns.toSet.intersect(AnchorCols) === Set.empty)
    assert(estMap(off, "join_est", "type_a", "type_b") ===
      estMap(on, "join_est", "type_a", "type_b"))
  }

  test("q159/q161: anchors-off drops the exact sorts, quantiles identical") {
    def qMap(df: DataFrame, keys: String*) =
      df.collect().map { r =>
        keys.map(k => r.get(r.fieldIndex(k)).toString).mkString("|") ->
          r.getLong(r.fieldIndex("q_est"))
      }.toMap
    val on159 = Layout.q159QuantileSketch(spark, Sf)
    val off159 = anchorsOff(Layout.q159QuantileSketch(spark, Sf))
    assert(off159.columns.toSet.intersect(AnchorCols) === Set.empty)
    assert(!off159.columns.contains("q_exact"))
    assert(qMap(off159, "event_type", "p") === qMap(on159, "event_type", "p"))

    val on161 = Layout.q161QuantileRolling(spark, Sf)
    val off161 = anchorsOff(Layout.q161QuantileRolling(spark, Sf))
    assert(off161.columns.toSet.intersect(AnchorCols) === Set.empty)
    assert(!off161.columns.contains("q_exact"))
    assert(qMap(off161, "event_type", "d", "p") ===
      qMap(on161, "event_type", "d", "p"))
  }
}
