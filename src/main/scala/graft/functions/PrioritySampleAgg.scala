package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded top-k-by-priority sample as a TRUE mergeable partial
  * aggregate — the distributed shape of priority sampling (Duffield,
  * Lund, Thorup 2007: weighted sampling without replacement where each
  * item's priority is weight/uniform, the sample is the k largest
  * priorities, and the (k+1)-th priority is the threshold τ that makes
  * `Σ max(w_i, τ)` over the sample an unbiased estimator of ANY
  * subset-sum of the weights).
  *
  * Same execution contract as [[KmvSketch]]: the buffer holds only the
  * k largest (priority, item) entries per task as a live TreeSet under
  * ObjectHashAggregateExec, partials merge by keeping the k largest of
  * the union, and the exchange carries one O(k) sample per (task,
  * group) — a full per-group sort (the window-rank formulation) never
  * happens. Order is (priority DESC, item ASC): the item id breaks
  * exact-priority ties so the sample is deterministic cross-engine.
  *
  * Priorities here are built from RATIONAL arithmetic only
  * (w · 2^48 / (h48+1), one exact double product and one correctly-
  * rounded IEEE division — no transcendentals), so Spark and DuckDB
  * rank byte-identically; see `Layout.q149PrioritySample`.
  */
case class PrioritySample(
    item: Expression,
    weight: Expression,
    priority: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[(Double, UTF8String, Long)]] {

  require(k > 0, "priority-sample k must be positive")

  override def prettyName: String = "graft_priority_sample"

  override def children: Seq[Expression] = Seq(item, weight, priority)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PrioritySample =
    copy(item = newChildren(0), weight = newChildren(1), priority = newChildren(2))

  override def checkInputDataTypes(): TypeCheckResult =
    if (item.dataType == StringType && weight.dataType == LongType &&
      priority.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string item, bigint weight, double priority), got " +
        children.map(_.dataType.sql).mkString(", "))

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("w", LongType, nullable = false),
    StructField("priority", DoubleType, nullable = false))), containsNull = false)

  override def nullable: Boolean = false

  /** priority DESC, item ASC (tie-break; items are unique per group in
    * practice but the order must not depend on arrival). */
  private object Ord extends java.util.Comparator[(Double, UTF8String, Long)] {
    override def compare(
        a: (Double, UTF8String, Long), b: (Double, UTF8String, Long)): Int = {
      val c = java.lang.Double.compare(b._1, a._1)
      if (c != 0) c else a._2.compareTo(b._2)
    }
  }

  override def createAggregationBuffer(): java.util.TreeSet[(Double, UTF8String, Long)] =
    new java.util.TreeSet[(Double, UTF8String, Long)](Ord)

  private def insert(
      buf: java.util.TreeSet[(Double, UTF8String, Long)],
      p: Double, id: UTF8String, w: Long, owned: Boolean): Unit = {
    if (buf.size < k) {
      buf.add((p, if (owned) id else id.clone(), w)); ()
    } else {
      val last = buf.last()
      // strictly better than the current k-th (Ord < 0) ⇒ admit, evict —
      // but ONLY if add actually grew the set: a duplicate (same
      // priority + item, e.g. a repeated key) returns false, and
      // evicting then would silently shrink the sample below k (caught
      // by the SQL-surface spec feeding repeated users)
      if (Ord.compare((p, id, w), last) < 0 &&
        buf.add((p, if (owned) id else id.clone(), w))) {
        buf.pollLast(); ()
      }
    }
  }

  override def update(
      buf: java.util.TreeSet[(Double, UTF8String, Long)],
      input: InternalRow): java.util.TreeSet[(Double, UTF8String, Long)] = {
    val id = item.eval(input)
    val w = weight.eval(input)
    val p = priority.eval(input)
    if (id != null && w != null && p != null)
      insert(buf, p.asInstanceOf[Double], id.asInstanceOf[UTF8String],
        w.asInstanceOf[Long], owned = false)
    buf
  }

  override def merge(
      buf: java.util.TreeSet[(Double, UTF8String, Long)],
      other: java.util.TreeSet[(Double, UTF8String, Long)])
      : java.util.TreeSet[(Double, UTF8String, Long)] = {
    val it = other.iterator()
    var go = true
    // other is in rank order: once an entry fails the cap check every
    // later (worse-ranked) entry fails too
    while (go && it.hasNext) {
      val e = it.next()
      if (buf.size < k) { buf.add(e); () }
      else if (Ord.compare(e, buf.last()) < 0) {
        if (buf.add(e)) { buf.pollLast(); () } // same duplicate guard as insert
      }
      else go = false
    }
    buf
  }

  override def eval(buf: java.util.TreeSet[(Double, UTF8String, Long)]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) {
      val (p, id, w) = it.next()
      out(i) = InternalRow(id, w, p)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[(Double, UTF8String, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) {
      val (p, id, w) = it.next()
      out.writeDouble(p)
      out.writeLong(w)
      val b = id.getBytes
      out.writeInt(b.length)
      out.write(b)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[(Double, UTF8String, Long)] = {
    val in = ByteBuffer.wrap(bytes)
    val n = in.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val p = in.getDouble
      val w = in.getLong
      val len = in.getInt
      val b = new Array[Byte](len)
      in.get(b)
      buf.add((p, UTF8String.fromBytes(b), w))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): PrioritySample =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): PrioritySample =
    copy(inputAggBufferOffset = newOffset)
}

object PrioritySampleAgg {

  private val FnName = "graft_priority_sample"

  private def litK(e: Expression): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
    case other =>
      throw new IllegalArgumentException(s"priority-sample k must be an int literal, got $other")
  }

  /** Register (idempotent per session) and return the sample column:
    * array<struct<item, w, priority>> of the k top-priority rows in
    * rank order. Pass k+1 to also carry the threshold entry τ.
    */
  def prioritySample(
      spark: SparkSession, item: Column, weight: Column, priority: Column, k: Int): Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FnName,
      exprs => PrioritySample(exprs(0), exprs(1), exprs(2), litK(exprs(3))),
      "built-in")
    call_function(FnName, item, weight, priority, org.apache.spark.sql.functions.lit(k))
  }
}
