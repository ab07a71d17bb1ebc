package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.functions._

import graft.operators.ZIndex
import graft.plans.{ZoneMapFileIndex, ZoneMapScanSwap}

/** r15 #1 — the z-catalog face survives the session: the table's OWN
  * TBLPROPERTIES (`graft.zindex.dir` / `.root` / `.contract`) are the
  * source of truth and the JVM registry is only a cache. Pins:
  * (1) a table created by DDL alone (no registration call ever made
  *     for it) gets zone-map pruning AND metadata-only aggregate
  *     serving from its properties;
  * (2) the same holds in a FRESH session (own SessionState + shared
  *     state) where the rules are armed ONLY via GraftExtensions;
  * (3) a propertied table naming an unknown contract fails LOUDLY
  *     (its location holds generation dirs a flat listing misreads —
  *     silently not swapping would be a wrong-answer path);
  * (4) registrations key on the QUALIFIED identifier: a same-named
  *     table in another database is never swapped onto the layout. */
class ZCatalogPropsSpec extends SparkSpec {

  private def li(s: SparkSession, ids: Range) = {
    import s.implicits._
    ids.map { i =>
      (((i.toLong * 7919) % 2000), (i.toLong * 104729) % 15000,
        (i % 100).toLong, (i % 50 + 1).toDouble, Seq("A", "N", "R")(i % 3))
    }.toDF("l_partkey", "l_orderkey", "l_suppkey", "l_quantity",
      "l_returnflag")
  }

  private def scans(p: SparkPlan): Seq[FileSourceScanExec] = fileScans(p)

  /** Land the layout at a conf-independent root, create the table by
    * DDL with the properties only — the path an external catalog
    * writer (or a prior session) would leave behind. */
  private def propsTable(s: SparkSession, dir: String, root: String,
      name: String): String = {
    val t = ZIndex.Lineitem.copy(rootOverride = Some(root))
    val (r, gen) = ZIndex.ensure(s, dir, t)
    val ddl = s.read.parquet(s"$r/gen-$gen/files").schema.toDDL
    s.sql(s"CREATE TABLE $name ($ddl) USING parquet LOCATION '$r' " +
      s"TBLPROPERTIES ('${ZoneMapScanSwap.PropDir}' = '$dir', " +
      s"'${ZoneMapScanSwap.PropRoot}' = '$r', " +
      s"'${ZoneMapScanSwap.PropContract}' = 'lineitem')")
    name
  }

  private def armPlain(s: SparkSession): Unit = {
    if (!s.experimental.extraOptimizations.contains(ZoneMapScanSwap))
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ ZoneMapScanSwap
    if (!s.experimental.extraOptimizations.contains(
        graft.plans.ZoneAggServe))
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ graft.plans.ZoneAggServe
  }

  private def zoneIndexOf(df: DataFrame): ZoneMapFileIndex = {
    val ss = scans(df.queryExecution.executedPlan)
    assert(ss.nonEmpty, "the query must contain a file scan")
    val loc = ss.head.relation.location
    assert(loc.isInstanceOf[ZoneMapFileIndex],
      s"the propertied table's scan must re-arm onto the zone-mapped " +
        s"FileIndex from TBLPROPERTIES alone, got ${loc.getClass.getName}")
    loc.asInstanceOf[ZoneMapFileIndex]
  }

  private def exercise(s: SparkSession, dir: String, tbl: String): Unit = {
    val raw = s.read.parquet(s"$dir/lineitem.parquet")
    val k = raw.agg(min(col("l_orderkey"))).collect()(0).getLong(0)
    // a point lookup prunes through the re-armed index
    val df = s.sql(s"SELECT COUNT(*) AS n FROM $tbl WHERE l_orderkey = $k")
    val n = df.collect()(0).getLong(0)
    assert(n === raw.filter(col("l_orderkey") === k).count() && n > 0)
    val idx = zoneIndexOf(df)
    assert(idx.lastKept.get() < idx.lastTotal.get(),
      s"pruning must fire from metadata alone " +
        s"(kept ${idx.lastKept.get()} of ${idx.lastTotal.get()})")
    // and the metadata-only aggregate serves through the same arm
    val agg = s.sql(s"SELECT MIN(l_partkey) AS lo, MAX(l_partkey) AS hi, " +
      s"COUNT(*) AS n FROM $tbl")
    val rows = agg.collect().toSeq
    assert(scans(agg.queryExecution.executedPlan).isEmpty,
      "the un-grouped aggregate must be metadata-served with no scan")
    assert(rows === raw.agg(min(col("l_partkey")).as("lo"),
      max(col("l_partkey")).as("hi"), count(lit(1)).as("n"))
      .collect().toSeq)
  }

  test("a DDL-created propertied table re-arms pruning and metadata " +
      "serving with NO registration call (registry is a cache)") {
    val dir = TempDirs.create("graft_zprops_corp")
    li(spark, 0 until 16000).write.mode("overwrite")
      .parquet(s"$dir/lineitem.parquet")
    val tbl = s"graft_zprops_a_${math.abs(dir.hashCode)}"
    propsTable(spark, dir, TempDirs.create("graft_zprops_root") + "/z",
      tbl)
    armPlain(spark)
    try exercise(spark, dir, tbl)
    finally { spark.sql(s"DROP TABLE IF EXISTS $tbl"); () }
  }

  test("a FRESH session (own state, rules armed only via " +
      "GraftExtensions) gets the same arming from the catalog alone") {
    withExtSession { s2 =>
      val dir = TempDirs.create("graft_zprops_corp2")
      li(s2, 0 until 12000).write.mode("overwrite")
        .parquet(s"$dir/lineitem.parquet")
      val tbl = s"graft_zprops_b_${math.abs(dir.hashCode)}"
      propsTable(s2, dir, TempDirs.create("graft_zprops_root2") + "/z",
        tbl)
      // deliberately NO extraOptimizations and NO register call: the
      // injected extension rules must resolve the table's properties
      try exercise(s2, dir, tbl)
      finally { s2.sql(s"DROP TABLE IF EXISTS $tbl"); () }
    }
  }

  test("a propertied table naming an unknown contract fails loudly " +
      "instead of misreading generation directories") {
    val dir = TempDirs.create("graft_zprops_corp3")
    li(spark, 0 until 2000).write.mode("overwrite")
      .parquet(s"$dir/lineitem.parquet")
    val t = ZIndex.Lineitem.copy(
      rootOverride = Some(TempDirs.create("graft_zprops_root3") + "/z"))
    val (r, gen) = ZIndex.ensure(spark, dir, t)
    val ddl = spark.read.parquet(s"$r/gen-$gen/files").schema.toDDL
    val tbl = s"graft_zprops_c_${math.abs(dir.hashCode)}"
    spark.sql(s"CREATE TABLE $tbl ($ddl) USING parquet LOCATION '$r' " +
      s"TBLPROPERTIES ('${ZoneMapScanSwap.PropDir}' = '$dir', " +
      s"'${ZoneMapScanSwap.PropRoot}' = '$r', " +
      s"'${ZoneMapScanSwap.PropContract}' = 'no_such_contract')")
    armPlain(spark)
    try {
      val e = intercept[Throwable] {
        spark.sql(s"SELECT COUNT(*) AS n FROM $tbl").collect()
      }
      def messages(x: Throwable): Seq[String] =
        Option(x).toSeq.flatMap(t =>
          Option(t.getMessage).toSeq ++ messages(t.getCause))
      assert(messages(e).exists(_.contains("no such contract")),
        s"expected the loud unknown-contract failure, got $e")
    } finally { spark.sql(s"DROP TABLE IF EXISTS $tbl"); () }
  }

  test("the zone map is the table's ANALYZE: registration injects " +
      "exact rowCount/sizeInBytes from the footers and tracks appends") {
    val dir = TempDirs.create("graft_zprops_corp5")
    li(spark, 0 until 7000).write.mode("overwrite")
      .parquet(s"$dir/lineitem.parquet")
    val t = ZIndex.Lineitem.copy(
      rootOverride = Some(TempDirs.create("graft_zprops_root5") + "/z"))
    val tbl = graft.operators.ZCatalog.ensureRegistered(spark, dir, t)
    def stats() = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(tbl)).stats
        .getOrElse(fail("registration must inject catalog statistics"))
    def zoneSums() = {
      val es = ZIndex.resolveEntries(spark, dir, t)
      (es.map(_.rows).sum, es.map(_.status.getLen).sum)
    }
    try {
      val (r0, b0) = zoneSums()
      assert(r0 === 7000L)
      assert(stats().rowCount === Some(BigInt(r0)))
      assert(stats().sizeInBytes === BigInt(b0))
      li(spark, 7000 until 9000).write.mode("append")
        .parquet(s"$dir/lineitem.parquet")
      graft.operators.ZCatalog.ensureRegistered(spark, dir, t)
      val (r1, b1) = zoneSums()
      assert(r1 === 9000L)
      assert(stats().rowCount === Some(BigInt(r1)),
        "re-registration must track the appended generation's rowCount")
      assert(stats().sizeInBytes === BigInt(b1))
    } finally { spark.sql(s"DROP TABLE IF EXISTS $tbl"); () }
  }

  test("ad-hoc instance contracts key by (name, dir): two corpora " +
      "sharing a contract name each serve their own data after re-arm") {
    val dirA = TempDirs.create("graft_zprops_adhoc_a")
    val dirB = TempDirs.create("graft_zprops_adhoc_b")
    li(spark, 0 until 3000).write.mode("overwrite")
      .parquet(s"$dirA/lineitem.parquet")
    li(spark, 0 until 5000).write.mode("overwrite")
      .parquet(s"$dirB/lineitem.parquet")
    // instance contracts that CAPTURE their corpus (the weather-gold
    // shape): feed/load ignore the dir argument, so each is a valid
    // factory ONLY for the corpus it captured — exactly what the
    // (name, dir) registry key enforces (r15 verdict nit: the old
    // name-only if-absent registration let corpus A's instance arm
    // corpus B's table onto A's data)
    def captured(d: String, root: String) = graft.operators.ZTable(
      "zprops_adhoc_cap",
      _ => s"$d/lineitem.parquet",
      (s2, _) => s2.read.parquet(s"$d/lineitem.parquet"),
      "l_partkey", "l_orderkey", 8,
      rootOverride = Some(root))
    val tA = captured(dirA, TempDirs.create("graft_zprops_adhoc_ra") + "/z")
    val tB = captured(dirB, TempDirs.create("graft_zprops_adhoc_rb") + "/z")
    val tblA = graft.operators.ZCatalog.ensureRegistered(spark, dirA, tA)
    val tblB = graft.operators.ZCatalog.ensureRegistered(spark, dirB, tB)
    armPlain(spark)
    try {
      // drop the warm cache: both tables must RE-ARM from their
      // TBLPROPERTIES through the (name, dir)-keyed registrations
      ZoneMapScanSwap.clear()
      def n(tbl: String): Long = spark.sql(
        s"SELECT COUNT(*) AS n FROM $tbl WHERE l_suppkey >= 0")
        .collect()(0).getLong(0)
      assert(n(tblA) === 3000L, "corpus A's table must serve A's data")
      assert(n(tblB) === 5000L,
        "corpus B's table must serve B's data, never A's captured corpus")
      // a THIRD corpus declaring the same contract name without its own
      // registration must fail loudly, not inherit A's or B's closures
      val dirC = TempDirs.create("graft_zprops_adhoc_c")
      li(spark, 0 until 100).write.mode("overwrite")
        .parquet(s"$dirC/lineitem.parquet")
      val tC = captured(dirC, TempDirs.create("graft_zprops_adhoc_rc") + "/z")
      val (rC, genC) = ZIndex.ensure(spark, dirC, tC)
      val ddl = spark.read.parquet(s"$rC/gen-$genC/files").schema.toDDL
      val tblC = s"graft_zprops_adhoc_c_${math.abs(dirC.hashCode)}"
      spark.sql(s"CREATE TABLE $tblC ($ddl) USING parquet LOCATION '$rC' " +
        s"TBLPROPERTIES ('${ZoneMapScanSwap.PropDir}' = '$dirC', " +
        s"'${ZoneMapScanSwap.PropRoot}' = '$rC', " +
        s"'${ZoneMapScanSwap.PropContract}' = 'zprops_adhoc_cap')")
      try {
        val e = intercept[Throwable] {
          spark.sql(s"SELECT COUNT(*) AS n FROM $tblC WHERE l_suppkey >= 0")
            .collect()
        }
        def messages(x: Throwable): Seq[String] =
          Option(x).toSeq.flatMap(t =>
            Option(t.getMessage).toSeq ++ messages(t.getCause))
        assert(messages(e).exists(_.contains("no such contract")),
          s"an unregistered (name, dir) must fail loudly, got $e")
      } finally { spark.sql(s"DROP TABLE IF EXISTS $tblC"); () }
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $tblA")
      spark.sql(s"DROP TABLE IF EXISTS $tblB"); ()
    }
  }

  test("registrations key on the qualified identifier: a same-named " +
      "table in another database is never swapped") {
    val dir = TempDirs.create("graft_zprops_corp4")
    li(spark, 0 until 9000).write.mode("overwrite")
      .parquet(s"$dir/lineitem.parquet")
    val tbl = s"graft_zprops_d_${math.abs(dir.hashCode)}"
    propsTable(spark, dir, TempDirs.create("graft_zprops_root4") + "/z",
      tbl)
    armPlain(spark)
    val db = s"graft_zprops_db_${math.abs(dir.hashCode)}"
    // the impostor: same bare name, other database, PLAIN parquet dir
    // (100 rows), no properties — must keep its ordinary index
    val plainDir = TempDirs.create("graft_zprops_plain")
    li(spark, 0 until 100).write.mode("overwrite")
      .parquet(s"$plainDir/plain.parquet")
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    spark.sql(s"CREATE TABLE $db.$tbl (l_partkey BIGINT, l_orderkey " +
      s"BIGINT, l_suppkey BIGINT, l_quantity DOUBLE, l_returnflag " +
      s"STRING) USING parquet LOCATION '$plainDir/plain.parquet'")
    try {
      exercise(spark, dir, tbl) // warms the default-db registration
      val df = spark.sql(
        s"SELECT COUNT(*) AS n FROM $db.$tbl WHERE l_suppkey >= 0")
      assert(df.collect()(0).getLong(0) === 100L,
        "the other-database table must read ITS OWN data")
      val ss = scans(df.queryExecution.executedPlan)
      assert(ss.nonEmpty &&
        !ss.head.relation.location.isInstanceOf[ZoneMapFileIndex],
        "a same-named table in another database must not be swapped")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $db.$tbl")
      spark.sql(s"DROP DATABASE IF EXISTS $db")
      spark.sql(s"DROP TABLE IF EXISTS $tbl"); ()
    }
  }
}
