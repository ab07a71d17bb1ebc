package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** FREQUENCY-CARRYING KMV — the join synopsis (Acharya et al. 1999,
  * q157's reference) as the fourth bounded mergeable aggregate on the
  * house contract: keep the k smallest distinct hashes, each with the
  * EXACT total weight of the rows that hashed to it. [[KmvSketch]]
  * answers "how many distinct keys"; this answers that AND "how often
  * does each kept key occur" — the per-key frequencies
  * [[graft.plans.KeySynopsis]] needs for the skew-aware join-size
  * estimator (Σ f_A·f_B over matched kept keys), which plain NDV
  * statistics provably cannot express.
  *
  * The frequencies are EXACT by downward-closure, not estimates: a hash
  * in the final bottom-k has fewer than k corpus hashes below it, so at
  * every prefix of the stream it is inside the current bottom-k — it is
  * inserted at first sight and never evicted, and every subsequent
  * occurrence lands on the ADD branch. (The same argument makes daily
  * kept sets mergeable into corpus kept sets with counts summed: a
  * corpus-bottom-k hash is in the bottom-k of every day it occurs on —
  * `KmvTable`'s key-tier bundle relies on exactly this.)
  *
  * Weight is an explicit second child rather than an implicit 1 so the
  * SAME aggregate runs both tiers: the corpus scan passes `lit(1L)` (one
  * row, one occurrence), a merge of stored partials passes the partial
  * count column (ADD composes associatively either way). Duplicate
  * semantics are therefore ADD — the one contract difference from
  * [[QuantileSketch]]'s REPLACE (same row identity, same value) and
  * [[KmvSketch]]'s ignore (set member already present).
  *
  * Same execution shape as the siblings: ≤ k live TreeMap entries per
  * (task, group) under ObjectHashAggregateExec, O(k) on the wire,
  * bottom-k-of-union merge with ascending early-exit, legal unchanged
  * as a streaming bounded-state aggregate. Deterministic and
  * cross-engine exact: DuckDB reproduces (kept hash, count) pairs with
  * a ROW_NUMBER bottom-k joined to a GROUP BY count — all integers.
  */
case class KmvFreqSketch(
    hash: Expression,
    weight: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeMap[UTF8String, Long]] {

  require(k > 0, "kmv-freq k must be positive")

  override def prettyName: String = "graft_kmv_freq"

  override def children: Seq[Expression] = Seq(hash, weight)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvFreqSketch =
    copy(hash = newChildren(0), weight = newChildren(1))

  override def checkInputDataTypes(): TypeCheckResult =
    if (hash.dataType == StringType && weight.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string hash, bigint weight), got " +
        children.map(_.dataType.sql).mkString(", "))

  /** Storage form: kept (hash, count) pairs sorted by hash ascending —
    * what the sketch table stores and [[graft.plans.JoinSynopsis]]
    * consumes. */
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("h", StringType, nullable = false),
    StructField("c", LongType, nullable = false))), containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): java.util.TreeMap[UTF8String, Long] =
    new java.util.TreeMap[UTF8String, Long]()

  /** Cap-insert with ADD-on-duplicate, shared by update (row input,
    * cloned key) and merge (adopted key from a discarded partial). The
    * present-key check comes FIRST: a duplicate must add even when it
    * equals the current k-th smallest (the eviction guard of the
    * sibling aggregates, ADD form — put-then-poll would drop the
    * just-merged count). Returns false iff the hash was DROPPED as
    * past-cap — merge's ascending early-exit signal. */
  private def insert(
      buf: java.util.TreeMap[UTF8String, Long],
      h: UTF8String, w: Long, owned: Boolean): Boolean = {
    // containsKey, NOT a get-against-null: through the Scala generic a
    // TreeMap get unboxes an absent key's null to 0L, so a null check
    // on it cannot distinguish absent from present
    if (buf.containsKey(h)) {
      buf.put(h, buf.get(h) + w); true
    } else if (buf.size < k) {
      buf.put(if (owned) h else h.clone(), w); true
    } else if (h.compareTo(buf.lastKey()) < 0) {
      buf.put(if (owned) h else h.clone(), w)
      buf.pollLastEntry(); true
    } else false
  }

  override def update(
      buf: java.util.TreeMap[UTF8String, Long],
      input: InternalRow): java.util.TreeMap[UTF8String, Long] = {
    val h = hash.eval(input)
    val w = weight.eval(input)
    if (h != null && w != null) {
      insert(buf, h.asInstanceOf[UTF8String], w.asInstanceOf[Long],
        owned = false); ()
    }
    buf
  }

  override def merge(
      buf: java.util.TreeMap[UTF8String, Long],
      other: java.util.TreeMap[UTF8String, Long])
      : java.util.TreeMap[UTF8String, Long] = {
    val it = other.entrySet().iterator()
    var go = true
    // other ascends: the first hash DROPPED as past-cap ends the merge
    // (every later hash is larger, and a hash larger than lastKey
    // cannot be present in buf)
    while (go && it.hasNext) {
      val e = it.next()
      go = insert(buf, e.getKey, e.getValue, owned = true)
    }
    buf
  }

  override def eval(buf: java.util.TreeMap[UTF8String, Long]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      out(i) = InternalRow(e.getKey, e.getValue)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val b = e.getKey.getBytes
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeMap[UTF8String, Long] = {
    val in = ByteBuffer.wrap(bytes)
    val n = in.getInt
    val buf = new java.util.TreeMap[UTF8String, Long]()
    var i = 0
    while (i < n) {
      val len = in.getInt
      val b = new Array[Byte](len)
      in.get(b)
      val c = in.getLong
      buf.put(UTF8String.fromBytes(b), c)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvFreqSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvFreqSketch =
    copy(inputAggBufferOffset = newOffset)
}

object KmvFreqAgg {

  private val FnName = "graft_kmv_freq"

  private def litK(e: Expression): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"kmv-freq k must be an int literal, got $other")
  }

  /** Register (idempotent per session) and return the sketch column:
    * `kmvFreq(spark, $"h", lit(1L), 64)` → array<struct<h, c>>. Pass
    * `lit(1L)` over raw rows, a stored partial-count column to merge
    * previously sketched partitions. */
  def kmvFreq(spark: SparkSession, hashCol: Column, weightCol: Column, k: Int): Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FnName, exprs => KmvFreqSketch(exprs(0), exprs(1), litK(exprs(2))), "built-in")
    call_function(FnName, hashCol, weightCol, org.apache.spark.sql.functions.lit(k))
  }
}
