package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash (Rabin–Karp) over a string's UTF-8 bytes —
  * the document-fingerprinting primitive, as a native Catalyst expression:
  * codegen'd into the generated row loop (no UDF serialization boundary,
  * stays inside WholeStageCodegen), null-safe, deterministic across
  * executors and runs.
  *
  * h₀ = seed; hᵢ = hᵢ₋₁ · base + byteᵢ  (wrapping 64-bit)
  */
case class RollingHash(child: Expression, base: Long, seed: Long)
    extends UnaryExpression {

  def this(child: Expression) = this(child, RollingHash.Base, RollingHash.Seed)

  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rolling_hash needs a string argument, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = seed
    var i = 0
    while (i < bytes.length) {
      h = h * base + (bytes(i) & 0xFF)
      i += 1
    }
    java.lang.Long.valueOf(h)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |byte[] $bytes = $str.getBytes();
         |long $h = ${seed}L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = $h * ${base}L + ($bytes[$i] & 0xFF);
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object RollingHash {
  val Base: Long = 1000003L
  val Seed: Long = 0xCBF29CE484222325L // FNV offset basis

  /** Column-level entry point. */
  def rolling_hash(c: Column): Column =
    GraftSqlBridge.column(new RollingHash(GraftSqlBridge.expression(c)))

  /** Register as a SQL function (`SELECT rolling_hash(text) …`). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_hash", exprs => new RollingHash(exprs.head), "built-in")
}
