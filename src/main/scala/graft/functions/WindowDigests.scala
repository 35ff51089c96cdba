package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** All k-token window digests of a token array in ONE amortized-O(1)
  * per token pass — the [[graft.operators.SubstringDedup]] phase-1
  * prefilter primitive.
  *
  * Each token is xxhash64'd ONCE (Spark's XXH64, seed 42 — the
  * `xxhash64` builtin); windows combine via a Rabin–Karp prefix roll
  * over the token hashes: `P[i+1] = P[i]·B + th[i]` (wrapping 64-bit),
  * `w[i] = P[i+k] − P[i]·Bᵏ`. Equal token windows therefore ALWAYS get
  * equal digests (no false negatives); collisions are possible and are
  * eliminated downstream by exact string verification over the
  * surviving candidates only.
  *
  * Replaces the `xxhash64(array_join(slice(toks, off, k), " "))` form,
  * which constructed an O(k)-byte string per token position — a ~k×
  * CPU/allocation amplification in the map stage at k = 50 (the shuffle
  * was already 8-byte digests; this fixes the map-side build cost).
  * Unlike [[ShingleHashes]] (which hashes truncated tail windows for
  * Jaccard), documents shorter than k emit an EMPTY array — substring
  * dedup must never consider sub-k windows.
  *
  * 100 TB shape: pure codegen'd narrow map, zero shuffles, output is
  * (n−k+1) longs per document. */
case class WindowDigests(child: Expression, k: Int)
    extends UnaryExpression {

  require(k >= 1, s"window size must be >= 1, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"window_digests needs an array<string> argument, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    WindowDigests.digests(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      s"""
         |${ev.value} = graft.functions.WindowDigests.digests($arr, $k);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object WindowDigests {

  /** Prefix-roll combiner base (the ShingleHashes/RollingHash family). */
  val B: Long = 1000003L

  /** The whole-array pass — public because generated code calls it. */
  def digests(arr: ArrayData, k: Int): GenericArrayData = {
    val n = arr.numElements()
    if (n < k) return new GenericArrayData(new Array[Long](0))
    val pref = new Array[Long](n + 1)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      val th = if (s == null) 0L else XXH64.hashUTF8String(s, 42L)
      pref(i + 1) = pref(i) * B + th
      i += 1
    }
    var bk = 1L
    i = 0
    while (i < k) { bk *= B; i += 1 }
    val out = new Array[Long](n - k + 1)
    i = 0
    while (i + k <= n) {
      out(i) = pref(i + k) - pref(i) * bk
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column-level entry point. */
  def window_digests(tokens: Column, k: Int): Column =
    GraftSqlBridge.column(WindowDigests(
      GraftSqlBridge.expression(tokens), k))
}
