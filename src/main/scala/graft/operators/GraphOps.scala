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
  * blobs, so a handful of rounds. For adversarially long chains use
  * [[connectedComponentsStar]] — the alternating large-star/small-star
  * contraction (same join shape per round, O(log n) rounds independent
  * of diameter, and the edge set shrinks as components contract). The
  * driver loop only ever collects a one-row convergence count, never
  * data.
  */
object GraphOps {

  /** Superseded-round release ([[graft.util.Checkpoints.release]]):
    * iterative loops otherwise pin O(rounds) of round-state blocks per
    * call — measured: a second q77 run in the same JVM went 8 s → 26 s
    * purely from the previous run's leaked states. Release-safe here
    * because every consumer of a superseded frame has been materialized
    * into its own checkpoint (or a collected count) first.
    */
  private def release(df: DataFrame): Unit = graft.util.Checkpoints.release(df)

  /** Alternating large-star/small-star contraction — the adversarial-
    * diameter path (the published MapReduce CC construction: alternating
    * min-attach rounds contract every component to a star around its
    * minimum in O(log n) rounds REGARDLESS of diameter, and — unlike
    * label propagation, which drags the full edge set through every
    * round — the edge set itself shrinks as components contract).
    *
    *  - large-star: each center attaches its LARGER neighbors to
    *    m = min(center ∪ neighbors);
    *  - small-star: each node attaches its smaller neighbors and itself
    *    to the minimum of that set.
    *
    * Both rounds are a groupBy-min + equi-join on node id — the same
    * shuffle shape as [[connectedComponents]], so the 100 TB posture is
    * identical per round with fewer, cheaper rounds on long chains.
    * Fixpoint: the edge list is exactly {(component-min, member)}.
    * GraphOpsSpec proves output equality with [[connectedComponents]] on
    * chains, stars, cliques and random blob graphs.
    */
  def connectedComponentsStar(edges: DataFrame, maxIters: Int = 50): DataFrame = {
    val eAll = edges.toDF("a", "b")
    // REGIME PICK on |E| (r16 optimization; the q125 broadcast-regime
    // pattern): each contraction round costs ~5 driver-scheduled jobs
    // (two star passes, their checkpoints, the exceptAll convergence
    // probe) — a fixed protocol bill that dwarfs the data at gate
    // scale (the sf0.1 pairs store's label build spent ~4 s contracting
    // a KB-sized edge set). Below the threshold the edge list IS
    // driver-sized metadata: collect once, exact union-find with
    // component-min labels — the identical unique fixpoint — in one
    // job. The limit(N+1) probe doubles as the collect, so the small
    // regime pays ONE pass; an over-threshold graph wastes only the
    // truncated probe and takes the distributed rounds. 2M edges ≈
    // 32 MB of longs — comfortable driver metadata; conf-overridable
    // (0 forces the distributed path, which GraphOpsSpec pins equal).
    val maxDriver = eAll.sparkSession.conf
      .getOption("spark.graft.cc.driverMaxEdges")
      .flatMap(_.toLongOption).getOrElse(2000000L)
    if (maxDriver > 0 && maxDriver < Int.MaxValue) {
      val probe = eAll.limit(maxDriver.toInt + 1).collect()
      if (probe.length <= maxDriver) return driverUnionFind(eAll, probe)
    }
    // node set from the UNFILTERED list: a node whose only edge is a
    // self-loop must still label itself (parity with connectedComponents)
    val nodes = eAll.select(col("a").as("id"))
      .unionByName(eAll.select(col("b").as("id"))).distinct().localCheckpoint(true)
    val e0 = eAll.filter(col("a") =!= col("b"))
    // canonical (small, large) orientation
    var cur = e0
      .select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
      .distinct().localCheckpoint(true)
    var converged = false
    var it = 0
    while (!converged && it < maxIters) {
      // large-star over the symmetric adjacency: per center c,
      // m = min(c, N(c)); larger neighbors re-attach to m
      val sym = cur.select(col("u").as("c"), col("v").as("n"))
        .unionByName(cur.select(col("v").as("c"), col("u").as("n")))
      val mins = sym.groupBy(col("c")).agg(min(col("n")).as("mn"))
        .select(col("c"), least(col("c"), col("mn")).as("m"))
      val ls = sym.join(mins, "c").filter(col("n") > col("c"))
        .select(least(col("n"), col("m")).as("u"), greatest(col("n"), col("m")).as("v"))
        .filter(col("u") =!= col("v")).distinct().localCheckpoint(true)
      // small-star on (parent < child) edges: per child v,
      // m = min parent; every parent and v itself attach to m
      val byChild = ls.groupBy(col("v")).agg(min(col("u")).as("m"))
      val next = ls.join(byChild, "v").select(col("u").as("x"), col("m"))
        .unionByName(byChild.select(col("v").as("x"), col("m")))
        .filter(col("x") =!= col("m"))
        .select(col("m").as("u"), col("x").as("v"))
        .distinct().localCheckpoint(true)
      converged = next.exceptAll(cur).isEmpty && cur.exceptAll(next).isEmpty
      release(ls)
      val prev = cur
      cur = next
      release(prev)
      it += 1
    }
    // the labeling below is only valid AT the fixpoint — a partial
    // contraction would silently split components, so fail loudly instead
    require(converged,
      s"connectedComponentsStar did not converge in $maxIters rounds")
    // nodes + the fixpoint edges survive into the returned plan — hand
    // them to the harness sweep (released only after the result is used)
    graft.util.Checkpoints.track(nodes)
    graft.util.Checkpoints.track(cur)
    // at fixpoint every edge is (component-min, member); isolated former
    // nodes (their whole component contracted onto them) label themselves
    nodes.join(cur.select(col("v").as("id"), col("u").as("lbl")), Seq("id"), "left")
      .select(col("id"), coalesce(col("lbl"), col("id")).as("label"))
  }

  /** The small-regime body of [[connectedComponentsStar]]: exact
    * union-find (path-halving + union by rank) over the collected edge
    * rows, labels = per-component minimum — the same unique fixpoint
    * the contraction converges to, so the two regimes are
    * interchangeable (GraphOpsSpec pins equality with the forced
    * distributed path). Self-loop-only nodes label themselves, exactly
    * like the distributed left join's coalesce. */
  private def driverUnionFind(eAll: DataFrame,
      rows: Array[org.apache.spark.sql.Row]): DataFrame = {
    val parent = new java.util.HashMap[Long, Long]()
    val rank = new java.util.HashMap[Long, Int]()
    def add(x: Long): Unit =
      if (!parent.containsKey(x)) { parent.put(x, x); rank.put(x, 0) }
    def find(x0: Long): Long = {
      var x = x0
      while (parent.get(x) != x) {
        val g = parent.get(parent.get(x)) // path halving
        parent.put(x, g)
        x = g
      }
      x
    }
    rows.foreach { r =>
      val a = r.getLong(0); val b = r.getLong(1)
      add(a); add(b)
      if (a != b) {
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) {
          val (hi, lo) =
            if (rank.get(ra) >= rank.get(rb)) (ra, rb) else (rb, ra)
          parent.put(lo, hi)
          if (rank.get(hi) == rank.get(lo))
            rank.put(hi, rank.get(hi) + 1)
        }
      }
    }
    val minOf = new java.util.HashMap[Long, Long]()
    parent.keySet().forEach { id =>
      val r = find(id)
      val m = minOf.getOrDefault(r, Long.MaxValue)
      if (id < m) minOf.put(r, id)
    }
    val out = new java.util.ArrayList[org.apache.spark.sql.Row](parent.size())
    parent.keySet().forEach { id =>
      out.add(org.apache.spark.sql.Row(id, minOf.get(find(id))))
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("label",
        org.apache.spark.sql.types.LongType, nullable = false)))
    eAll.sparkSession.createDataFrame(out, schema)
  }

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
      release(l1)
      val prev = labels
      labels = next
      release(prev)
      converged = changed == 0
      it += 1
    }
    release(sym) // the returned labels frame is its own checkpoint
    // unconverged labels are only "min seen so far" — per-component minima
    // have NOT reached everyone, so downstream keep/drop decisions would
    // double-keep documents; fail loudly instead
    require(converged,
      s"connectedComponents did not converge in $maxIters rounds")
    // the returned frame is its own checkpoint; harness-swept, not leaked
    graft.util.Checkpoints.track(labels)
  }
}
