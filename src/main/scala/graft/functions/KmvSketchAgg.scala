package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** KMV (k-minimum-values) distinct sketch as a TRUE mergeable partial
  * aggregate: per task the buffer holds only the k smallest DISTINCT
  * hash values seen; partial buffers merge by taking the k smallest of
  * the union (min-k of a union == min-k of the merged min-k sets), so
  * the exchange carries one O(k)-sized sketch per (task, group) and the
  * full distinct set is NEVER materialized or shuffled — this is the
  * shape a 100 TB profiler needs (the reference's exact
  * `COUNT(DISTINCT …)`, A5 / aggregation.py:146, at sketch scale).
  *
  * Input is a fixed-width lowercase-hex md5 string; binary UTF8String
  * order == numeric order of the 128-bit hash, so the result — n_kept
  * and the k-th smallest hash — is DETERMINISTIC and cross-engine
  * byte-identical with a window-based SQL definition (the q139 oracle).
  * Buffer is a bounded java TreeSet (dedup + order + O(log k)
  * cap-insert in one structure); ObjectHashAggregateExec keeps it as a
  * live JVM object between updates and serializes it only at partial
  * exchange boundaries.
  */
case class KmvSketch(
    child: Expression,
    k: Int,
    full: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[UTF8String]]
  with UnaryLike[Expression] {

  require(k > 0, "kmv k must be positive")

  override def prettyName: String = if (full) "graft_kmv_full" else "graft_kmv"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string hash argument, got ${child.dataType.sql}")

  /** `full = false`: the estimator pair (n_kept, k-th smallest hash).
    * `full = true`: the ENTIRE kept set as a sorted array — the form a
    * sketch TABLE stores so later queries can merge sketches without
    * rescanning the source (min-k of a union == min-k over the union of
    * kept sets, so "merge" is just re-sketching the exploded arrays).
    */
  override def dataType: DataType =
    if (full) org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
    else StructType(Seq(
      StructField("n_kept", IntegerType, nullable = false),
      StructField("hk", StringType, nullable = true)))

  override def nullable: Boolean = false

  override def createAggregationBuffer(): java.util.TreeSet[UTF8String] =
    new java.util.TreeSet[UTF8String]()

  /** Cap-insert: keep the set at ≤ k smallest distinct values. The
    * UTF8String from an unsafe input row aliases reused memory — clone
    * before retaining. Compare BEFORE cloning so rows past the k-th
    * value cost one comparison and zero allocation (the steady state
    * once the sketch saturates).
    */
  private def insert(buf: java.util.TreeSet[UTF8String], h: UTF8String): Unit = {
    if (buf.size < k) { buf.add(h.clone()); () }
    else if (h.compareTo(buf.last()) < 0 && buf.add(h.clone())) { buf.pollLast(); () }
  }

  override def update(
      buf: java.util.TreeSet[UTF8String], input: InternalRow): java.util.TreeSet[UTF8String] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[UTF8String])
    buf
  }

  override def merge(
      buf: java.util.TreeSet[UTF8String],
      other: java.util.TreeSet[UTF8String]): java.util.TreeSet[UTF8String] = {
    val it = other.iterator()
    // other is ascending: once one value fails the cap check, the rest
    // (all larger) fail too — merge is O(min(k, |other|) log k)
    var go = true
    while (go && it.hasNext) {
      val h = it.next()
      if (buf.size < k) { buf.add(h); () } // already owned copies — no clone
      else if (h.compareTo(buf.last()) < 0) { if (buf.add(h)) { buf.pollLast(); () } }
      else go = false
    }
    buf
  }

  override def eval(buf: java.util.TreeSet[UTF8String]): Any =
    if (full)
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        buf.toArray(Array.empty[AnyRef]))
    else InternalRow(buf.size, if (buf.isEmpty) null else buf.last())

  override def serialize(buf: java.util.TreeSet[UTF8String]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) {
      val b = it.next().getBytes
      out.writeInt(b.length)
      out.write(b)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[UTF8String] = {
    val in = ByteBuffer.wrap(bytes)
    val n = in.getInt
    val buf = new java.util.TreeSet[UTF8String]()
    var i = 0
    while (i < n) {
      val len = in.getInt
      val b = new Array[Byte](len)
      in.get(b)
      buf.add(UTF8String.fromBytes(b))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketch =
    copy(child = newChild)
}

object KmvSketchAgg {

  private val FnName = "graft_kmv"
  private val FnNameFull = "graft_kmv_full"

  private def litK(e: Expression): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(s"kmv k must be an int literal, got $other")
  }

  /** Register (idempotent per session) and return the sketch column:
    * `kmv(spark, $"h", 64)` → struct(n_kept, hk). The analyzer wraps the
    * registry-resolved AggregateFunction in a Complete AggregateExpression,
    * so it composes with other aggregates in one `.agg(...)`.
    */
  def kmv(spark: SparkSession, hashCol: Column, k: Int): Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FnName, exprs => KmvSketch(exprs.head, litK(exprs(1))), "built-in")
    call_function(FnName, hashCol, org.apache.spark.sql.functions.lit(k))
  }

  /** [[kmv]] in storage form: the full kept set as a sorted array<string>,
    * for sketch TABLES that later queries merge (see [[KmvSketch.dataType]]).
    */
  def kmvFull(spark: SparkSession, hashCol: Column, k: Int): Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FnNameFull, exprs => KmvSketch(exprs.head, litK(exprs(1)), full = true), "built-in")
    call_function(FnNameFull, hashCol, org.apache.spark.sql.functions.lit(k))
  }
}
