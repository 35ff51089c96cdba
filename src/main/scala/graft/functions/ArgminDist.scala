package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Argmin of squared Euclidean distance from a double vector to a fixed
  * centroid set — KMeansDet's assignment kernel as a native expression.
  *
  * Semantics identical to the HOF form
  * `array_position(dists, array_min(dists)) - 1` for finite inputs:
  * per-centroid distance is the LEFT FOLD of (xᵢ − cᵢ)² in dimension
  * order (same IEEE addition sequence), and the LOWEST centroid index
  * among equal minima wins (strict `<` keeps the first). A null array,
  * a null element, or fewer than `d` elements yields NULL — callers
  * (KMeansDet.fitVec/labelExprVec) filter or guard unusable rows, so
  * NaN never reaches this expression.
  *
  * Why an expression and not the HOF chain: the centroids ride in a
  * codegen REFERENCE OBJECT, so the generated source text is identical
  * across Lloyd iterations even though the centroid VALUES change —
  * Spark's codegen cache compiles it once per fit instead of once per
  * iteration, and the k·d inner loop is a generated double loop instead
  * of interpreted lambdas (the HOF form cost ~1 s/iteration at k = 16,
  * d = 64, n = 5000 — pure interpretation overhead).
  */
case class ArgminDist(child: Expression, cents: Array[Array[Double]])
    extends UnaryExpression {

  private val k = cents.length
  private val d = if (k == 0) 0 else cents(0).length
  require(k >= 1 && d >= 1 && cents.forall(_.length == d),
    "centroids must be a non-empty rectangular k x d array")

  // flat row-major copy: one reference object, cache-friendly loop
  private lazy val flat: Array[Double] = {
    val a = Array.ofDim[Double](k * d)
    var j = 0
    while (j < k) {
      System.arraycopy(cents(j), 0, a, j * d, d); j += 1
    }
    a
  }

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"argmin_dist needs an array<double> argument, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (arr.numElements() < d) return null
    var i = 0
    while (i < d) {
      if (arr.isNullAt(i)) return null
      i += 1
    }
    var bestJ = 0
    var best = 0.0
    var j = 0
    while (j < k) {
      var s = 0.0
      i = 0
      while (i < d) {
        val t = arr.getDouble(i) - flat(j * d + i)
        s += t * t
        i += 1
      }
      if (j == 0 || s < best) { best = s; bestJ = j }
      j += 1
    }
    java.lang.Integer.valueOf(bestJ)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("argminCents", flat, "double[]")
    nullSafeCodeGen(ctx, ev, arr => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val t = ctx.freshName("t")
      val best = ctx.freshName("best")
      val bestJ = ctx.freshName("bestJ")
      s"""
         |if ($arr.numElements() < $d) { ${ev.isNull} = true; }
         |else {
         |  for (int $i = 0; $i < $d; $i++) {
         |    if ($arr.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  }
         |}
         |if (!${ev.isNull}) {
         |  int $bestJ = 0;
         |  double $best = 0.0;
         |  for (int $j = 0; $j < $k; $j++) {
         |    double $s = 0.0;
         |    for (int $i = 0; $i < $d; $i++) {
         |      double $t = $arr.getDouble($i) - $cRef[$j * $d + $i];
         |      $s += $t * $t;
         |    }
         |    if ($j == 0 || $s < $best) { $best = $s; $bestJ = $j; }
         |  }
         |  ${ev.value} = $bestJ;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object ArgminDist {
  /** Column-level entry point. */
  def argmin_dist(v: Column, cents: Array[Array[Double]]): Column =
    GraftSqlBridge.column(ArgminDist(GraftSqlBridge.expression(v), cents))
}
