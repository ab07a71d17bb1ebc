package graft.util

import org.apache.spark.sql.SparkSession

/** Between-query hygiene for the one-JVM harness runs (Bench/Verify run
  * 90+ queries in a single session). Round-5 measurement: with end-only
  * teardown, late-suite queries inherit the whole suite's debris — leaked
  * localCheckpoint blocks, loaded streaming state-store providers (each
  * holding its state map on heap), un-reaped shuffle files/broadcasts —
  * and recorded up to 11× their isolated cost (q81 63.5 s in-suite vs
  * 5.65 s isolated). Sweeping between queries makes each archived number
  * approximate the query's true isolated cost; the cross-query memo
  * caches that are deliberately shared (weather silver/gold, the shingle
  * index, IVF centroids) are NOT touched.
  */
object Harness {

  /** Run after a query's result is fully materialized (counted/written). */
  def sweep(spark: SparkSession): Unit = {
    // per-query transient checkpoints/caches registered at their mint site
    Checkpoints.sweep()
    // streaming state-store providers stay registered (state maps on heap,
    // maintenance threads polling) after their query stops — unload them;
    // the next streaming query reloads its own from its checkpoint as usual
    org.apache.spark.sql.graft.StateStoreHygiene.unloadAll()
    // drop references to terminated StreamingQuery objects
    spark.streams.resetTerminated()
    // ContextCleaner reaps shuffle files + broadcasts only after their
    // driver-side handles are GC'd — force the collection so the reaping
    // happens between queries, not mid-measurement
    System.gc()
  }

  /** Releasing a superseded localCheckpoint is deliberate here (every
    * consumer already materialized), but Spark WARNs "lineage has been
    * truncated and cannot be recomputed" on each one — ~100 of them per
    * suite would bury a real warning. Silence exactly that logger (the
    * emitting class of checkpointed plans) in harness mains; library
    * users keep the default.
    */
  def quietLineageWarn(): Unit =
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.rdd.MapPartitionsRDD",
      org.apache.logging.log4j.Level.ERROR)
}
