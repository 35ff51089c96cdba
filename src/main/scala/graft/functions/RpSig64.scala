package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** 64-bit random-hyperplane LSH signature of a double vector: bit j is
  * the sign of the projection onto hyperplane j, where plane weights are
  * Rademacher (±1) — sign s(j,i) is bit j of splitmix64(seed ^ i·φ).
  * Collision probability of a bit between two vectors is 1 − θ/π (θ the
  * angle between them), the classic sign-random-projection family —
  * banding the 64 bits gives an ANN candidate generator (Similarity
  * .rpLshTopK). One generated loop: per dimension ONE hash, then 64
  * weighted votes off its bits — O(64·dim) adds, no allocation beyond
  * the vote array, dimension-agnostic, deterministic for a given seed
  * (fixed i-order summation per row). */
case class RpSig64(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"rp_sig64 needs (array<double>, bigint seed), got $l and $r")
    }

  // a null element poisons the signature → NULL (same rule as dot_q)
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any, s: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val seed = s.asInstanceOf[Long]
    val n = arr.numElements()
    val votes = new Array[Double](64)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val x = arr.getDouble(i)
      val h = RpSig64.planeHash(seed, i)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) votes(j) += x else votes(j) -= x
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) sig |= (1L << j)
      j += 1
    }
    java.lang.Long.valueOf(sig)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (arr, seed) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val x = ctx.freshName("x")
      val votes = ctx.freshName("votes")
      val sig = ctx.freshName("sig")
      s"""
         |int $n = $arr.numElements();
         |double[] $votes = new double[64];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($arr.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  double $x = $arr.getDouble($i);
         |  long $h = $seed ^ ((long) $i * 0x9E3779B97F4A7C15L);
         |  $h ^= ($h >>> 30); $h *= 0xBF58476D1CE4E5B9L;
         |  $h ^= ($h >>> 27); $h *= 0x94D049BB133111EBL;
         |  $h ^= ($h >>> 31);
         |  for (int $j = 0; $j < 64; $j++) {
         |    if ((($h >>> $j) & 1L) == 1L) $votes[$j] += $x;
         |    else $votes[$j] -= $x;
         |  }
         |}
         |long $sig = 0L;
         |if (!${ev.isNull}) {
         |  for (int $j = 0; $j < 64; $j++) {
         |    if ($votes[$j] > 0) $sig |= (1L << $j);
         |  }
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object RpSig64 {
  /** Hyperplane hash for dimension `i`: splitmix64(seed ^ i·φ). Bit j of
    * the result is the Rademacher sign of plane j at dimension i — a
    * pure function of (seed, i), so an oracle can embed the 64 values as
    * literals. The generated code inlines the identical arithmetic. */
  def planeHash(seed: Long, i: Int): Long = {
    var h = seed ^ (i.toLong * 0x9E3779B97F4A7C15L)
    h ^= (h >>> 30); h *= 0xBF58476D1CE4E5B9L
    h ^= (h >>> 27); h *= 0x94D049BB133111EBL
    h ^ (h >>> 31)
  }

  /** Column-level entry point. */
  def rp_sig64(v: Column, seed: Column): Column =
    GraftSqlBridge.column(
      RpSig64(GraftSqlBridge.expression(v), GraftSqlBridge.expression(seed)))

  /** Register as a SQL function (`SELECT rp_sig64(v, seed) …`). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rp_sig64", exprs => RpSig64(exprs.head, exprs(1)), "built-in")
}
