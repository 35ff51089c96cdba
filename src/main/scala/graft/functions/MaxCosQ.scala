package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Fixed-point max-cosine of one quantized vector against a broadcast
  * eval set: `max_i floor(dot(v, evals[i]) / (‖v‖·norms[i]) · 1e9)`,
  * with `-1e9` for zero norms, degenerate slots, or an empty eval set —
  * the inner loop of semantic decontamination
  * (graft.operators.Decontaminate.semanticFlag) as ONE native codegen'd
  * expression.
  *
  * The HOF formulation it replaces (`array_max(transform(evals, e →
  * sim))`) ran interpreted AND re-evaluated the row's quantization and
  * norm once per eval element (the lambda-CSE trap): measured ~10 s for
  * 495 rows × 4.5k evals. Here `‖v‖` is computed once per row and the
  * double arithmetic `dot / (vn·en) · 1e9` is ordered exactly like the
  * Column form so the SQL oracle's floor replays bit-for-bit. */
case class MaxCosQ(vec: Expression, evals: Expression, norms: Expression)
    extends TernaryExpression {

  override def first: Expression = vec
  override def second: Expression = evals
  override def third: Expression = norms

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  private val Sentinel = -1000000000L

  override def checkInputDataTypes(): TypeCheckResult = {
    (vec.dataType, evals.dataType, norms.dataType) match {
      case (ArrayType(LongType, _),
            ArrayType(ArrayType(LongType, _), _),
            ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"max_cos_q needs (array<bigint>, array<array<bigint>>, " +
          s"array<double>), got $other")
    }
  }

  override def nullSafeEval(v: Any, es: Any, ns: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val ev = es.asInstanceOf[ArrayData]
    val en = ns.asInstanceOf[ArrayData]
    val d = x.numElements()
    var vs = 0L
    var i = 0
    var bad = false
    while (i < d && !bad) {
      if (x.isNullAt(i)) bad = true
      else { val l = x.getLong(i); vs += l * l }
      i += 1
    }
    if (bad) return java.lang.Long.valueOf(Sentinel)
    val vn = java.lang.Math.sqrt(vs.toDouble)
    var best = Sentinel
    val m = java.lang.Math.min(ev.numElements(), en.numElements())
    var k = 0
    while (k < m) {
      if (!ev.isNullAt(k) && !en.isNullAt(k)) {
        val e = ev.getArray(k)
        val enk = en.getDouble(k)
        if (e.numElements() == d && vn > 0 && enk > 0) {
          var s = 0L
          var j = 0
          var ok = true
          while (j < d && ok) {
            if (e.isNullAt(j)) ok = false
            else { s += x.getLong(j) * e.getLong(j); j += 1 }
          }
          if (ok) {
            val fp = java.lang.Math.floor(
              s.toDouble / (vn * enk) * 1e9).toLong
            if (fp > best) best = fp
          }
        }
      }
      k += 1
    }
    java.lang.Long.valueOf(best)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, es, ns) => {
      val d = ctx.freshName("d")
      val vs = ctx.freshName("vs")
      val vn = ctx.freshName("vn")
      val bad = ctx.freshName("bad")
      val best = ctx.freshName("best")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val j = ctx.freshName("j")
      val e = ctx.freshName("e")
      val enk = ctx.freshName("enk")
      val s = ctx.freshName("s")
      val ok = ctx.freshName("ok")
      val l = ctx.freshName("l")
      val fp = ctx.freshName("fp")
      s"""
         |int $d = $v.numElements();
         |long $vs = 0L; boolean $bad = false;
         |for (int $i = 0; $i < $d && !$bad; $i++) {
         |  if ($v.isNullAt($i)) { $bad = true; }
         |  else { long $l = $v.getLong($i); $vs += $l * $l; }
         |}
         |long $best = ${Sentinel}L;
         |if (!$bad) {
         |  double $vn = java.lang.Math.sqrt((double) $vs);
         |  int $m = java.lang.Math.min($es.numElements(), $ns.numElements());
         |  for (int $k = 0; $k < $m; $k++) {
         |    if (!$es.isNullAt($k) && !$ns.isNullAt($k)) {
         |      org.apache.spark.sql.catalyst.util.ArrayData $e = $es.getArray($k);
         |      double $enk = $ns.getDouble($k);
         |      if ($e.numElements() == $d && $vn > 0 && $enk > 0) {
         |        long $s = 0L; boolean $ok = true;
         |        for (int $j = 0; $j < $d && $ok; $j++) {
         |          if ($e.isNullAt($j)) { $ok = false; }
         |          else { $s += $v.getLong($j) * $e.getLong($j); }
         |        }
         |        if ($ok) {
         |          long $fp = (long) java.lang.Math.floor(
         |            ((double) $s) / ($vn * $enk) * 1e9);
         |          if ($fp > $best) $best = $fp;
         |        }
         |      }
         |    }
         |  }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(vec = newFirst, evals = newSecond, norms = newThird)
}

object MaxCosQ {
  /** Column-level entry point. */
  def max_cos_q(vec: Column, evals: Column, norms: Column): Column =
    GraftSqlBridge.column(MaxCosQ(
      GraftSqlBridge.expression(vec),
      GraftSqlBridge.expression(evals),
      GraftSqlBridge.expression(norms)))
}
