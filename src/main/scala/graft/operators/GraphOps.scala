package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an edge list — the step that turns pairwise
  * near-dup HITS (q44–q47) into dedup DECISIONS: all transitively-linked
  * documents form one cluster, and the minimum doc_id is the canonical
  * keeper. Without it, pairwise output (A,B), (B,C) double-keeps B or C.
  *
  * Algorithm: minimum-label propagation — every node starts labeled with
  * itself; each round every node takes the min of its own and its
  * neighbors' labels; fixpoint = per-component minimum everywhere. The
  * fixpoint is UNIQUE (order-independent), so results are deterministic
  * and oracle-checkable against a recursive-CTE transitive closure.
  *
  * Scale: each round is one equi-join + groupBy on node id (shuffle by
  * id), rounds ≤ graph diameter; near-dup graphs are short-diameter
  * blobs, so a handful of rounds. For adversarially long chains the
  * round count grows — the standard fix is the large-star/small-star
  * contraction (alternating min-joins that halve diameter per round,
  * same join shape). The driver loop only ever collects a one-row
  * convergence count, never data.
  */
object GraphOps {

  /** `edges`: two long columns (a, b), undirected. Returns (id, label)
    * for every node appearing in an edge, label = component minimum.
    *
    * Each round does neighbor-min propagation PLUS a pointer jump
    * (`label := label(label)`), so label depth halves per round —
    * convergence in O(log diameter) rounds instead of O(diameter); a
    * 1000-link chain resolves in ~10 rounds. The final labels frame is
    * materialized and the loop caches released before returning.
    */
  def connectedComponents(edges: DataFrame, maxIters: Int = 50): DataFrame = {
    val e = edges.toDF("a", "b")
    // eager localCheckpoint, not cache: iterative algorithms re-optimize
    // their whole logical plan on EVERY action, so the upstream
    // candidate-generation pipeline (e.g. the q45 LSH tree) would be
    // re-analyzed each round even with its data cached — checkpointing
    // truncates plan and lineage to a materialized RDD. (On a cluster with
    // unreliable executors swap for reliable `checkpoint`.)
    val sym = e.unionByName(e.select(col("b").as("a"), col("a").as("b")))
      .distinct().localCheckpoint(true)
    var labels = sym.select(col("a").as("id")).distinct()
      .withColumn("label", col("id")).localCheckpoint(true)
    var converged = false
    var it = 0
    while (!converged && it < maxIters) {
      // neighbor min. Both union branches are alias-refreshed (`.as` mints
      // fresh exprIds): checkpointed LogicalRDD branches sharing attribute
      // ids trip Union's constraint rewrite (NoSuchElementException in
      // rewriteConstraints) — GraphOpsSpec covers this path.
      val viaNeighbors = sym.join(labels, sym("a") === labels("id"))
        .select(col("b").as("id"), col("label").as("label"))
      val l1 = labels.select(col("id").as("id"), col("label").as("label"))
        .unionByName(viaNeighbors)
        .groupBy(col("id")).agg(min(col("label")).as("label"))
        .localCheckpoint(true) // self-joined below
      // pointer jump: follow the label's own label (left join — a label
      // that is a component minimum maps to itself)
      val next = l1.as("x")
        .join(l1.select(col("id").as("lid"), col("label").as("llabel")).as("y"),
          col("x.label") === col("y.lid"), "left")
        .select(col("x.id").as("id"),
          least(col("x.label"), coalesce(col("y.llabel"), col("x.label"))).as("label"))
        .localCheckpoint(true)
      val changed = next.as("n").join(labels.as("p"), "id")
        .filter(col("n.label") =!= col("p.label")).count()
      labels = next
      converged = changed == 0
      it += 1
    }
    labels
  }
}
