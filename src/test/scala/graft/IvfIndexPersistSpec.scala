package graft

import graft.operators.VectorOps

/** The IVF index is a durable on-disk artifact (VERDICT-r7 #2): centroids
  * and per-cell counts persist as parquet keyed by corpus identity, so a
  * fresh JVM loads the index instead of retraining. The spec simulates
  * the fresh-JVM shape by clearing the in-memory memo (exactly what a
  * process restart loses) and asserts the rerun performs ZERO train
  * passes while producing byte-identical output; a touched corpus must
  * invalidate the stamp and retrain.
  */
class IvfIndexPersistSpec extends SparkSpec {

  private def withIndexRoot[T](f: => T): T = {
    spark.conf.set("spark.graft.ivf.indexDir", TempDirs.create("graft_ivf_root"))
    try f finally spark.conf.unset("spark.graft.ivf.indexDir")
  }

  test("q57 reloads persisted centroids after memo loss — no retrain, same rows") {
    withIndexRoot {
      VectorOps.clear()
      val first = VectorOps.queries("q57_ann_ivf")(spark, Sf).collect().toSeq
      val trained = VectorOps.trainPasses.get()
      assert(trained >= 1, "first run must train")
      VectorOps.clear() // what a JVM restart loses: the hot memo layer
      val loads0 = VectorOps.indexLoads.get()
      val second = VectorOps.queries("q57_ann_ivf")(spark, Sf).collect().toSeq
      assert(VectorOps.trainPasses.get() === trained, "rerun must load, not retrain")
      assert(VectorOps.indexLoads.get() > loads0, "rerun must hit the on-disk index")
      assert(second === first)
    }
  }

  test("q135 reloads centroids AND standing cell counts — no retrain, no standing re-assign") {
    withIndexRoot {
      VectorOps.clear()
      val first = VectorOps.queries("q135_ivf_incremental")(spark, Sf).collect().toSeq
      val trained = VectorOps.trainPasses.get()
      VectorOps.clear()
      val loads0 = VectorOps.indexLoads.get()
      val second = VectorOps.queries("q135_ivf_incremental")(spark, Sf).collect().toSeq
      assert(VectorOps.trainPasses.get() === trained, "rerun must load, not retrain")
      // both artifacts load from disk: inc centroids + standing cell counts
      assert(VectorOps.indexLoads.get() >= loads0 + 2)
      assert(second === first)
    }
  }

  test("a regenerated corpus changes the stamp and retrains (stale index never served)") {
    withIndexRoot {
      val corpus = TempDirs.create("graft_ivf_corpus")
      val emb = spark.read.parquet(s"$Sf/embeddings.parquet")
      emb.write.parquet(s"$corpus/embeddings.parquet")
      VectorOps.clear()
      VectorOps.queries("q57_ann_ivf")(spark, corpus).collect()
      val trained = VectorOps.trainPasses.get()
      // regenerate the corpus in place: same content, new files/mtimes
      emb.write.mode("overwrite").parquet(s"$corpus/embeddings.parquet")
      VectorOps.clear()
      VectorOps.queries("q57_ann_ivf")(spark, corpus).collect()
      assert(VectorOps.trainPasses.get() > trained,
        "regenerated corpus must invalidate the persisted index")
    }
  }
}
