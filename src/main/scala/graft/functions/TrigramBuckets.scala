package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All char-trigram hash buckets of an (already-normalized) string in
  * ONE compiled pass — the [[graft.operators.LangId]] hot loop.
  *
  * Bit-identical to the Catalyst formulation
  * `transform(sequence(1, n−2), i => hash32(substring(s, i, 3)) % B)`
  * with `hash32 = conv(substr(md5(g || ':' || salt), 1, 8), 16, 10)`
  * (the [[graft.operators.Sampling.hash32]] recipe — the first 4 md5
  * digest bytes as an unsigned 32-bit value): trigram positions count
  * CODE POINTS like Spark's `substring`/`length`, the md5 input is the
  * trigram's UTF-8 bytes followed by ":salt". The HOF form evaluated
  * interpreted — one md5 via hex-string concat/conv per element plus
  * an O(i) UTF8String position walk per substring, ~10 s over the
  * sf0.1 corpus; this pass walks the bytes once, reuses one
  * MessageDigest, and parses no hex.
  *
  * NORMALIZATION STAYS IN CATALYST (`lower(regexp_replace(text,
  * '\s+', ' '))` feeds this expression): lowercase/regex semantics are
  * engine-subtle, so parity with the SQL oracle is kept by sharing the
  * builtins rather than reimplementing them. Pure narrow map, zero
  * shuffles, stream-safe. */
case class TrigramBuckets(child: Expression, salt: String, buckets: Int)
    extends UnaryExpression {

  require(buckets >= 2, s"need >= 2 buckets, got $buckets")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"trigram_buckets needs a string argument, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    TrigramBuckets.eval(input.asInstanceOf[UTF8String], salt, buckets)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val saltRef = ctx.addReferenceObj("salt", salt,
      classOf[String].getName)
    // `TrigramBuckets$.MODULE$`: no static forwarder exists for the
    // object's eval — the companion class inherits eval(InternalRow)
    // from Expression and the name clash suppresses it (see LangScore).
    nullSafeCodeGen(ctx, ev, str => {
      s"""
         |${ev.value} = graft.functions.TrigramBuckets$$.MODULE$$.eval(
         |  $str, $saltRef, $buckets);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object TrigramBuckets {

  private val md5Local =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  /** The whole-string pass — public because generated code calls it. */
  def eval(s: UTF8String, salt: String, buckets: Int): GenericArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    // code-point start offsets (Spark substring counts code points)
    val starts = new Array[Int](n + 1)
    var cp = 0
    var i = 0
    while (i < n) {
      starts(cp) = i
      val b = bytes(i)
      i += (if ((b & 0x80) == 0) 1
        else if ((b & 0xE0) == 0xC0) 2
        else if ((b & 0xF0) == 0xE0) 3
        else 4)
      cp += 1
    }
    starts(cp) = n
    if (cp < 3) return new GenericArrayData(new Array[Long](0))
    val saltBytes = (":" + salt).getBytes("UTF-8")
    val md = md5Local.get()
    val out = new Array[Long](cp - 2)
    var p = 0
    while (p + 3 <= cp) {
      md.reset()
      md.update(bytes, starts(p), starts(p + 3) - starts(p))
      md.update(saltBytes)
      val d = md.digest()
      // first 8 hex digits = first 4 digest bytes, as unsigned 32-bit
      val h = ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
        ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
      out(p) = h % buckets
      p += 1
    }
    new GenericArrayData(out)
  }

  /** Column entry point — feed it the NORMALIZED text. */
  def trigram_buckets(normText: Column, salt: String,
      buckets: Int): Column =
    GraftSqlBridge.column(TrigramBuckets(
      GraftSqlBridge.expression(normText), salt, buckets))
}
