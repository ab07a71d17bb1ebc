package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorExpressions
import graft.sources.Tables

/** q191 — the EMBEDDING modality's streaming near-dup gate, completing
  * the continuous-dedup trio (exact fingerprints q190, MinHash text
  * q189, embedding cosine here): a stream of incoming vectors is
  * checked for near-duplicates (cos ≥ 0.4 — the q47/q81 contract)
  * against the standing corpus through the q49 multi-table multi-probe
  * sign-LSH, with the standing side a DURABLE index layout under the
  * [[ZIndex]] generation contract — O(delta) appends (the bucket
  * projection is vector-local: fixed md5-derived hyperplanes, no
  * corpus statistics), mutation → rebuild, and the gate never re-reads
  * the corpus embeddings.
  *
  * Stateless per row except the per-batch pair dedup: the L=6 bucket
  * keys are pure sign projections against literal hyperplanes (the
  * fused [[graft.functions.LshSignBuckets]] expression — no watermark,
  * no streaming state), multi-probe fans each row to its bucket plus
  * the B one-bit flips, candidates come from the (t, bucket) equi-join
  * against the stored index rows (vectors ride the index, so the
  * exact-cosine verify is a projection of the joined row), and
  * `dropDuplicates` collapses multi-probe matches within the batch —
  * see [[q191StreamVecGate]] for why that equals the global dedup.
  *
  * The THRESHOLD shape is deliberate: top-k per query (q49's output)
  * is an aggregation a no-watermark stream cannot legally run; the
  * dedup-gate question — "is this vector a near-duplicate of anything
  * standing?" — is a threshold filter, stateless by nature.
  *
  * The index width follows the [[VectorOps.lshBitsFor]] B(N) rule
  * (every verify/bench corpus resolves to the floor B=8, which is what
  * lets the static DuckDB oracle pin that width); the width is stamped
  * into the LAYOUT NAME, so a corpus growing past a rule boundary
  * reshards into a fresh layout — a full rebuild, exactly the periodic
  * recluster every clustered layout amortizes — while same-width
  * appends stay O(delta) against the standing generations. (The
  * superseded width's directory is left for the operator to drop, like
  * any retired layout generation.)
  *
  * At 100 TB: the index is L rows per standing vector at a width that
  * keeps buckets ≈32 rows; per batch the gate pays ONE scan of the
  * index — the raw embeddings corpus is never re-read — plus O(batch)
  * broadcast bytes, with no stream-side state, at any stream
  * volume. */
object VecGate {

  private val SimThreshold = 0.4

  /** The standing sign-LSH index rows of an embeddings frame:
    * (vec_id, v, nrm, t, bucket) — the q49 construction at the given
    * bit width, vectors riding the rows (the measured-faster shape:
    * the slim-index/rejoin variant shipped every candidate through two
    * more exchanges). */
  private def indexRows(df: DataFrame, bits: Int): DataFrame = {
    VectorExpressions.register(df.sparkSession)
    df.withColumn("v", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
      .withColumn("nrm", sqrt(VectorExpressions.dot(col("v"), col("v"))))
      .select(col("vec_id"), col("v"), col("nrm"),
        posexplode(graft.functions.LshSignBuckets.buckets(
          col("v"), VectorOps.LshTables, bits)).as(Seq("t", "bucket")))
  }

  /** The durable standing index at a bit width: (t, bucket)-range-
    * clustered — the probe join's partition axis. The width rides the
    * layout NAME (see object doc: width change = reshard).
    *
    * The prep (sign + explode) is EXPENSIVE: the build fans the feed
    * (`prepFan`) so signing parallelism never hangs on the feed's
    * split count, and [[ZIndex.rangeClusterOnce]] keeps range
    * partitioning from evaluating the signing twice. */
  private[graft] def lshTable(bits: Int): ZTable = ZTable(
    s"vec_lsh_index_b$bits",
    d => s"$d/embeddings.parquet",
    (s, d) => Tables.embeddings(s, d),
    "vec_id", "vec_id", 12, // informational; clusterWith overrides
    clusterWith = Some((df, n) =>
      ZIndex.rangeClusterOnce(df, n, col("t"), col("bucket"))),
    prep = Some(df => indexRows(df.filter(col("vec_id") % 10 =!= 0), bits)),
    prepFan = 32)

  /** The B(N) width for a corpus dir — one metadata-cheap count, the
    * same resolution q49 performs per query. */
  private[graft] def bitsFor(spark: SparkSession, dir: String): Int =
    VectorOps.lshBitsFor(Tables.embeddings(spark, dir).count())

  /** The corpus's current-width index table (Bench prewarm pricing,
    * gate resolution). */
  def lshFor(spark: SparkSession, dir: String): ZTable =
    lshTable(bitsFor(spark, dir))

  private[graft] def standingIndex(spark: SparkSession, dir: String,
      bits: Int): DataFrame = {
    val entries = ZIndex.resolveEntries(spark, dir, lshTable(bits))
    spark.read.parquet(entries.map(_.status.getPath.toString): _*)
  }

  private def standingSide(spark: SparkSession, dir: String, bits: Int)
      : DataFrame =
    standingIndex(spark, dir, bits)
      .select(col("vec_id").as("b_id"), col("v").as("b_v"),
        col("nrm").as("b_nrm"), col("t"), col("bucket"))

  /** The gate plan shared by the stream's batches and the batch twin,
    * shaped so NOTHING corpus-scale ever moves (the first cut SMJ'd the
    * standing index against vector-fat probes — 1.4 GB exchanged + two
    * sorts per run at the 200k replica; the q173 lesson applied):
    *
    *   - SLIM probes: the multi-probe fan-out (own bucket + the B
    *     one-bit flips) carries (q_id, t, bucket) only — the incoming
    *     vectors do NOT ride the 6·(B+1)× explode;
    *   - the probes BROADCAST onto the standing scan: the index files
    *     stream through a BroadcastHashJoin in place, un-shuffled and
    *     un-sorted — per-batch cost is one index scan, and the moved
    *     bytes are O(batch), never O(corpus);
    *   - the incoming vectors broadcast once more (one row per vector)
    *     for the inline exact-cosine verify, then threshold, then pair
    *     dedup (the only exchange, over final pairs).
    *
    * Both joins pipeline in one whole-stage-codegen pass over the
    * index. Broadcast size is bounded by the micro-batch, not the
    * corpus — maxFilesPerTrigger/maxBytesPerTrigger is the governor at
    * production volume. */
  private def gatePlan(incoming: DataFrame, standing: DataFrame,
      bits: Int): DataFrame = {
    VectorExpressions.register(incoming.sparkSession)
    val probeCols: Seq[Column] = col("bucket") +:
      (0 until bits).map(j => col("bucket").bitwiseXOR(lit(1L << j)))
    val slimProbes = indexRows(incoming, bits)
      .select(col("vec_id").as("q_id"), col("t"),
        explode(array(probeCols: _*)).as("bucket"))
    val qVecs = incoming
      .withColumn("q_v", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
      .withColumn("q_nrm",
        sqrt(VectorExpressions.dot(col("q_v"), col("q_v"))))
      .select(col("vec_id").as("q_id"), col("q_v"), col("q_nrm"))
    standing
      .join(broadcast(slimProbes), Seq("t", "bucket"))
      .join(broadcast(qVecs), Seq("q_id"))
      .withColumn("sim6", VectorOps.roundSafe6(
        VectorOps.cosine("q_v", "b_v", "q_nrm", "b_nrm")))
      .filter(col("sim6") >= SimThreshold)
      .select(col("q_id"), col("b_id"), col("sim6"))
      .dropDuplicates("q_id", "b_id")
  }

  /** The gate's batch twin — identical probes, joins, threshold, and
    * dedup over the same standing index, executed as one batch query
    * (VecGateSpec pins stream == batch). */
  private[graft] def batchGate(spark: SparkSession, dir: String): DataFrame =
    batchGateAt(spark, dir, bitsFor(spark, dir))

  private[graft] def batchGateAt(spark: SparkSession, dir: String,
      bits: Int): DataFrame =
    gatePlan(
      Tables.embeddings(spark, dir).filter(col("vec_id") % 10 === 0),
      standingSide(spark, dir, bits), bits)

  /** q191 — see object doc. Output: one row per (incoming vector,
    * standing near-duplicate) at cos ≥ 0.4, with the rounded cosine.
    *
    * foreachBatch, deliberately: the probe side must be the BROADCAST
    * build side (see [[gatePlan]]) and a streaming side can never
    * broadcast in a stream-static join — inside foreachBatch each
    * micro-batch is a plain DataFrame, so the flipped plan applies
    * per batch. Pair dedup per batch equals the global dedup for this
    * feed: a file-sourced append stream delivers each incoming vector
    * in exactly one batch, and pairs are keyed by the incoming id. */
  def q191StreamVecGate(spark: SparkSession, dir: String): DataFrame =
    // input-derived shuffle partitioning for the gate's per-batch plans
    // and sink writes (see graft.streaming.StreamTune)
    graft.streaming.StreamTune.withStatePartitions(
      spark, Seq(s"$dir/embeddings.parquet")) {
      q191Body(spark, dir)
    }

  private def q191Body(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    // register on the MAIN session before the stream starts: the
    // micro-batch runs under a session CLONE whose function registry
    // is copied from here — registering only inside the per-batch
    // plan build is too late when no prior query armed this JVM
    VectorExpressions.register(spark)
    val base = java.nio.file.Files
      .createTempDirectory("graft_vec_stream_").toString
    val (feedDir, ckpt, outPath) = (s"$base/feed", s"$base/ckpt", s"$base/out")
    val emb = Tables.embeddings(spark, dir)
    // spread the feed so each micro-batch signs in parallel
    emb.filter(col("vec_id") % 10 === 0).repartition(32)
      .write.mode("overwrite").parquet(feedDir)
    val bits = bitsFor(spark, dir)
    val standing = standingSide(spark, dir, bits)
    // the production batch-size governor (bounds the per-batch
    // broadcast): unset = drain in one batch, the test default.
    // Per-batch dedup stays equal to global dedup at ANY batching —
    // each feed file (hence each vector) lands in exactly one batch
    // (VecGateSpec pins equality at maxFilesPerTrigger=1)
    val reader = spark.readStream.schema(emb.schema)
    spark.conf.getOption("spark.graft.gate.maxFilesPerTrigger")
      .foreach(v => reader.option("maxFilesPerTrigger", v))
    val q = reader.parquet(feedDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        gatePlan(batch, standing, bits)
          .write.mode("append").parquet(outPath)
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val out = spark.read.parquet(outPath)
      .orderBy(col("q_id"), col("b_id"))
      .localCheckpoint(true)
    graft.util.Checkpoints.track(out)
    val p = new org.apache.hadoop.fs.Path(base)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    out
  }

  /** DuckDB oracle: the identical split, buckets, probes, and
    * threshold off the raw table (B pinned at the floor — the same
    * static-width convention as [[VectorOps.q49Sql]]; every test
    * corpus resolves there). */
  val q191Sql: String = {
    val tables = (0 until VectorOps.LshTables).map { t =>
      s"SELECT vec_id, v, nrm, $t AS t, " +
        s"${VectorOps.bucketExprSqlDuck(t, VectorOps.DefaultLshBits)} " +
        s"AS bucket FROM v"
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH ${VectorOps.SqlVecs},
       |bucketed AS (
       |  $tables),
       |standing AS (SELECT * FROM bucketed WHERE vec_id % 10 <> 0),
       |probes AS (
       |  SELECT vec_id, v, nrm, t,
       |    unnest(list_concat([bucket],
       |      list_transform(generate_series(0, ${VectorOps.DefaultLshBits - 1}),
       |        j -> xor(bucket, CAST(1 << j AS BIGINT))))) AS bucket
       |  FROM bucketed WHERE vec_id % 10 = 0)
       |SELECT DISTINCT a.vec_id AS q_id, b.vec_id AS b_id,
       |  round((list_dot_product(a.v, b.v)/(a.nrm*b.nrm))*1e6)/1e6 + 0.0 AS sim6
       |FROM probes a JOIN standing b ON a.t = b.t AND a.bucket = b.bucket
       |WHERE round((list_dot_product(a.v, b.v)/(a.nrm*b.nrm))*1e6)/1e6
       |  >= $SimThreshold
       |ORDER BY q_id, b_id""".stripMargin
  }
}
