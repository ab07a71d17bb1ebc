package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Executor-side handle to a broadcast Bloom filter: the bitmap ships
  * once per executor as broadcast BYTES (compact, torrent-chunked) and
  * deserializes lazily into the probe-ready sketch on first use.
  */
final class BloomRef(bc: Broadcast[Array[Byte]]) extends Serializable {
  @transient private lazy val bf: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bc.value))
  def contains(h: Long): Boolean = bf.mightContainLong(h)
}

/** Codegen'd membership probe of a broadcast Bloom filter over an int64
  * key — the hand-placed runtime-filter primitive for joins whose probe
  * side is a generated stream Catalyst cannot see through (q125's wedge
  * stream: InjectRuntimeFilter only fires on selective scans, not on a
  * self-join's output). False positives only — callers must re-verify
  * with an exact join; false negatives never (BloomFilter contract), so
  * pruned rows are provably non-matching.
  *
  * A Scala UDF would pay per-row boxing on billions of probes; this
  * compiles to one virtual call inside whole-stage codegen.
  */
case class BloomFilterContains(child: Expression, ref: BloomRef)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint argument, got ${child.dataType.sql}")

  override def dataType: DataType = BooleanType

  override def nullSafeEval(h: Any): Any = ref.contains(h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.addReferenceObj("bloomRef", ref, classOf[BloomRef].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $r.contains($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomExpressions {

  private val FnName = "graft_bloom_contains"

  /** Serialize + broadcast `bf`, register the probe under a session temp
    * function, and return a Column factory. DataFrame construction
    * resolves the function EAGERLY (Dataset analysis), so the captured
    * broadcast is bound at call time even though the name is shared.
    */
  def broadcastProbe(spark: SparkSession, bf: BloomFilter): Column => Column = {
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    val ref = new BloomRef(spark.sparkContext.broadcast(bos.toByteArray))
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FnName, exprs => BloomFilterContains(exprs.head, ref), "built-in")
    (c: Column) => call_function(FnName, c)
  }
}
