package graft

/** The production session profile really takes effect: optimizer knobs
  * land in the session conf and the extensions register through the
  * builder injection. (The `spark.sql.extensions` STRING path is a static
  * conf readable only at SparkContext creation — untestable on the shared
  * test context, which is exactly why Conf.production sets BOTH; this
  * spec exercises the embedding case, the one a conf-string typo could
  * not break.)
  */
class ConfSpec extends SparkSpec {

  test("production profile sets the documented knobs and loads the extensions") {
    withCustomSession(b => Conf.production(b, 16)) { s =>
      assert(s.conf.get("spark.sql.adaptive.enabled") === "true")
      assert(s.conf.get("spark.sql.adaptive.skewJoin.enabled") === "true")
      assert(s.conf.get("spark.sql.shuffle.partitions") === "32")
      assert(s.conf.get("spark.sql.files.maxPartitionBytes") === (256L << 20).toString)
      assert(s.conf.get("spark.sql.autoBroadcastJoinThreshold") === (64L << 20).toString)
      assert(s.conf.get("spark.sql.session.timeZone") === "UTC")
      // extensions active: the SQL surface resolves without Scala imports
      val km = s.sql("SELECT graft_haversine_km(52.5, 13.4, 48.1, 11.6) AS km")
        .collect()(0).getDouble(0)
      assert(km > 500 && km < 510, s"Berlin-Munich ~504 km, got $km")
    }
  }
}
