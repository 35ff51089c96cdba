package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Full minhash signature in ONE pass over the shingle set: element j is
  * min over shingles h of h·aⱼ + bⱼ (wrapping 64-bit). The HOF
  * formulation this replaces — numPerms separate
  * `array_min(transform(sh, h => h*a+b))` columns — materializes
  * numPerms intermediate arrays per document and walks the shingle set
  * numPerms times; this is one generated double loop, no allocation
  * beyond the signature itself. Values are identical (MinHashSigSpec).
  */
case class MinHashSig(child: Expression, as: Seq[Long], bs: Seq[Long])
    extends UnaryExpression {

  require(as.nonEmpty && as.length == bs.length,
    "need matching non-empty permutation parameter lists")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig needs an array<bigint> argument, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val k = as.length
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var j = 0
      while (j < k) {
        val v = h * as(j) + bs(j)
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("mhAs", as.toArray, "long[]")
    val bRef = ctx.addReferenceObj("mhBs", bs.toArray, "long[]")
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val mins = ctx.freshName("mins")
      s"""
         |int $n = $arr.numElements();
         |long[] $mins = new long[${as.length}];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $arr.getLong($i);
         |  for (int $j = 0; $j < ${as.length}; $j++) {
         |    long $v = $h * $aRef[$j] + $bRef[$j];
         |    if ($v < $mins[$j]) $mins[$j] = $v;
         |  }
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object MinHashSig {
  /** Column-level entry point. */
  def minhash_sig(c: Column, as: Seq[Long], bs: Seq[Long]): Column =
    GraftSqlBridge.column(MinHashSig(GraftSqlBridge.expression(c), as, bs))
}
