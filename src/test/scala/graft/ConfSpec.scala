package graft

import org.apache.spark.sql.SparkSession

/** The production session profile really takes effect: optimizer knobs
  * land in the session conf and the extensions (SQL functions + radius
  * rewrite) register from the `spark.sql.extensions` string alone — the
  * pure-SQL-user path, no Scala imports.
  */
class ConfSpec extends SparkSpec {

  test("production profile sets the documented knobs and loads the extensions") {
    val base = spark // ensure the shared context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = Conf.production(SparkSession.builder().master("local[4]"), 16)
        .getOrCreate()
      assert(s.conf.get("spark.sql.adaptive.enabled") === "true")
      assert(s.conf.get("spark.sql.adaptive.skewJoin.enabled") === "true")
      assert(s.conf.get("spark.sql.shuffle.partitions") === "32")
      assert(s.conf.get("spark.sql.files.maxPartitionBytes") === (256L << 20).toString)
      assert(s.conf.get("spark.sql.autoBroadcastJoinThreshold") === (64L << 20).toString)
      assert(s.conf.get("spark.sql.session.timeZone") === "UTC")
      // extensions loaded purely from the conf string: the SQL surface works
      val km = s.sql("SELECT graft_haversine_km(52.5, 13.4, 48.1, 11.6) AS km")
        .collect()(0).getDouble(0)
      assert(km > 500 && km < 510, s"Berlin-Munich ~504 km, got $km")
    } finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }
}
