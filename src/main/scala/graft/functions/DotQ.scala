package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Quantized dot product Σ aᵢ·bᵢ over two long arrays — the inner loop of
  * every cosine/ANN operator (graft.operators.Similarity), as a native
  * Catalyst expression. The `zip_with` + `aggregate` HOF formulation it
  * replaces materializes an intermediate array per pair comparison and
  * runs interpreted lambda steps; this is one codegen'd loop over the two
  * ArrayData buffers — no allocation, stays in WholeStageCodegen.
  * Wrapping 64-bit arithmetic, identical to the HOF form (asserted in
  * DotQSpec; value-pinned by the d_embed_cosine_dup / s_ann_topk SQL
  * oracles). */
case class DotQ(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"dot_q needs two array<bigint> arguments, got " +
          s"${left.dataType} and ${right.dataType}")
  }

  // Unequal lengths or a null element yield NULL — same as the
  // zip_with+aggregate form this replaces (zip_with pads the shorter
  // side with null; aggregate's `acc + null` is null). Never getLong a
  // null slot: the read is undefined.
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getLong(i) * y.getLong(i)
      i += 1
    }
    java.lang.Long.valueOf(s)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $s = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += $a.getLong($i) * $b.getLong($i);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotQ {
  /** Column-level entry point. */
  def dot_q(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      DotQ(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Register as a SQL function (`SELECT dot_q(a, b) …`). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_q", exprs => DotQ(exprs.head, exprs(1)), "built-in")
}
