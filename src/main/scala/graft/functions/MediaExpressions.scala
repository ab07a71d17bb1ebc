package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Codegen'd 64-bit average-hash (aHash) over a binary payload — the
  * media fingerprint of q140.
  *
  * Why an Expression and not array built-ins: the natural higher-order
  * formulation (`transform(sequence(0,63), b -> aggregate(slice(codes,
  * …)))` over a `split`-derived code array) re-evaluates the code-array
  * subtree at every reference after `CollapseProject` inlines it — 129
  * copies per row, measured at 57 ms/row (286 s for 5 000 docs at
  * sf0.1). This compiles to two tight byte-loop passes inside
  * whole-stage codegen: ~μs/row, no intermediate arrays, no shuffle.
  *
  * Semantics (mirrored 1:1 by the q140 DuckDB oracle): project the
  * payload to printable ASCII (0x20–0x7E; every byte of a multi-byte
  * UTF-8 sequence is ≥ 0x80, so this equals dropping non-ASCII chars —
  * the codec stub standing in for raster decode), then bit b of the
  * result is 1 iff the mean byte of block b (positions p with
  * ⌊p·64/n⌋ = b) exceeds the global mean — compared integer
  * cross-multiplied (`bs·n > total·bc`), so no float enters the hash.
  * Payloads under 64 projected bytes return the sentinel -1 (an
  * impossible hash: all 64 blocks cannot sit above their own average).
  */
case class AHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary argument, got ${other.sql}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    AHash64.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.AHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AHash64 {

  /** Two-pass aHash over the printable-ASCII projection; -1 = under 64
    * projected bytes. Called from generated code — keep it static-shaped.
    */
  def compute(bytes: Array[Byte]): Long = {
    var n = 0L
    var total = 0L
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xFF
      if (b >= 32 && b <= 126) { n += 1; total += b }
      i += 1
    }
    if (n < 64) return -1L
    val bs = new Array[Long](64)
    val bc = new Array[Long](64)
    var pos = 0L
    i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xFF
      if (b >= 32 && b <= 126) {
        val blk = ((pos * 64L) / n).toInt
        bs(blk) += b
        bc(blk) += 1
        pos += 1
      }
      i += 1
    }
    var h = 0L
    var k = 0
    while (k < 64) {
      if (bs(k) * n > total * bc(k)) h |= (1L << k)
      k += 1
    }
    h
  }
}

object MediaExpressions {

  private val FnName = "graft_ahash64"

  /** Idempotent session registration. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FnName, exprs => AHash64(exprs.head), "built-in")

  /** 64-bit aHash of a binary column; -1 for under-64-byte payloads. */
  def ahash64(payload: Column): Column = call_function(FnName, payload)
}
