package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingle hashes from a token array, in ONE pass:
  * each token is xxhash64'd once (Spark's own XXH64, seed 42 — identical
  * to the `xxhash64` function), windows of `n` token hashes combine
  * polynomially (wrapping 64-bit), and the result is sort-deduped.
  *
  * Replaces the HOF pipeline `array_distinct(transform(sequence(...),
  * i => xxhash64(concat_ws(" ", slice(toks, i+1, n)))))`, which built a
  * sliced array AND a concatenated string per shingle and re-hashed every
  * token n times. The hash labels differ from the concat form, but every
  * consumer is label-invariant: Jaccard, minhash minima, band equality —
  * and the LSH and exhaustive dedup paths share this one shingle
  * definition (DedupSpec asserts equal survivor sets; the
  * d_ngram_jaccard SQL oracle is computed on string shingles and is
  * hash-invariant by construction).
  *
  * A truncated tail window (fewer than n tokens) hashes like the HOF
  * form's short slice: the window is whatever tokens remain.
  */
case class ShingleHashes(child: Expression, n: Int,
    portable: Boolean = false) extends UnaryExpression {

  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes needs an array<string> argument, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val t = arr.numElements()
    val th = new Array[Long](t)
    var i = 0
    while (i < t) {
      th(i) =
        if (portable) ShingleHashes.polyFmix(arr.getUTF8String(i))
        else XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
      i += 1
    }
    val cnt = math.max(t - n, 0) + 1
    val sh = new Array[Long](cnt)
    i = 0
    while (i < cnt) {
      var acc = 0L
      var j = i
      val end = math.min(i + n, t)
      while (j < end) {
        acc = acc * ShingleHashes.P + th(j)
        j += 1
      }
      sh(i) = acc
      i += 1
    }
    java.util.Arrays.sort(sh)
    var u = 0
    i = 0
    while (i < cnt) {
      if (i == 0 || sh(i) != sh(i - 1)) { sh(u) = sh(i); u += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(sh, u))
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val xxh = "org.apache.spark.sql.catalyst.expressions.XXH64"
      val t = ctx.freshName("t")
      val th = ctx.freshName("th")
      val cnt = ctx.freshName("cnt")
      val sh = ctx.freshName("sh")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val end = ctx.freshName("end")
      val acc = ctx.freshName("acc")
      val u = ctx.freshName("u")
      val tokHash =
        if (portable)
          s"graft.functions.ShingleHashes.polyFmix($arr.getUTF8String($i))"
        else s"$xxh.hashUTF8String($arr.getUTF8String($i), 42L)"
      s"""
         |int $t = $arr.numElements();
         |long[] $th = new long[$t];
         |for (int $i = 0; $i < $t; $i++) {
         |  $th[$i] = $tokHash;
         |}
         |int $cnt = java.lang.Math.max($t - $n, 0) + 1;
         |long[] $sh = new long[$cnt];
         |for (int $i = 0; $i < $cnt; $i++) {
         |  long $acc = 0L;
         |  int $end = java.lang.Math.min($i + $n, $t);
         |  for (int $j = $i; $j < $end; $j++) {
         |    $acc = $acc * ${ShingleHashes.P}L + $th[$j];
         |  }
         |  $sh[$i] = $acc;
         |}
         |java.util.Arrays.sort($sh);
         |int $u = 0;
         |for (int $i = 0; $i < $cnt; $i++) {
         |  if ($i == 0 || $sh[$i] != $sh[$i - 1]) { $sh[$u] = $sh[$i]; $u++; }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  java.util.Arrays.copyOf($sh, $u));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object ShingleHashes {
  /** Polynomial combiner base (same constant family as RollingHash). */
  val P: Long = 1000003L

  /** Engine-portable token hash: the RollingHash polynomial fold over
    * UTF-8 bytes, avalanched with murmur's fmix64 (same construction as
    * Dedup.simhash's portable mode — the raw poly hash leaves shared-
    * prefix tokens nearly collinear). Public because the generated code
    * calls it: one static call per token beats inlining the fold into
    * every codegen site. Every step is wrapping integer arithmetic a
    * SQL oracle replicates in int128 (see d_minhash_lsh). */
  def polyFmix(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = RollingHash.Seed
    var i = 0
    while (i < bytes.length) {
      h = h * RollingHash.Base + (bytes(i) & 0xFF)
      i += 1
    }
    h ^= (h >>> 33); h *= 0xFF51AFD7ED558CCDL
    h ^= (h >>> 33); h *= 0xC4CEB9FE1A85EC53L
    h ^ (h >>> 33)
  }

  /** Column-level entry point over a token array. */
  def shingle_hashes(tokens: Column, n: Int,
      portable: Boolean = false): Column =
    GraftSqlBridge.column(
      ShingleHashes(GraftSqlBridge.expression(tokens), n, portable))
}
