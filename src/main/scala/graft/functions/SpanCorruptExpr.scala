package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** T5 span corruption's whole per-row pipeline as ONE native expression
  * — the [[graft.operators.SpanCorrupt]] semantics (salted-md5 span
  * starts/lengths, overlap merge, sentinel numbering, input/target
  * assembly) in a single imperative pass.
  *
  * The Catalyst-HOF formulation it replaces (`aggregate` over the
  * zipped (token, mask) array, the accumulator arrays re-concatenated
  * per element) runs interpreted — measured ~9.5 s for 5 000 docs at
  * sf0.1, dominating the t_span_corrupt_ids gate; this pass is two
  * md5s per position plus linear assembly, codegen'd into the row
  * loop. Bit-identical to the HOF form (SpanCorruptSpec pins parity;
  * the t_span_corrupt oracle pins values): the per-position hashes are
  * EXACTLY `Sampling.hash32(id || ':' || pos, salt)` — first 8 hex
  * digits of the md5 — and the mask/sentinel rules replay the spec's
  * shift algebra. */
case class SpanCorruptExpr(left: Expression, right: Expression,
    rateK: Int, salt: String) extends BinaryExpression {

  override def dataType: DataType = SpanCorruptExpr.outType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"span_corrupt needs (string id, array<string> tokens), got $other")
    }

  // a NULL id RAISES — matching the [[graft.operators.SpanCorrupt
  // .corruptSpec]] path, where the null id flows through posKey's
  // concat into Sampling.hash32's null-id guard. The default
  // BinaryExpression short-circuit would instead silently emit null
  // inp/tgt/n_masked, and the parity property only covers non-null
  // ids. Null TOKENS still yield null (null text stays null).
  override def nullable: Boolean = right.nullable

  override def eval(input: InternalRow): Any = {
    val id = left.eval(input)
    if (id == null) throw SpanCorruptExpr.nullIdError()
    val toks = right.eval(input)
    if (toks == null) null
    else SpanCorruptExpr.corruptRow(id.asInstanceOf[UTF8String].toString,
      toks.asInstanceOf[ArrayData], rateK, salt)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
    val saltRef = ctx.addReferenceObj("salt", salt,
      classOf[String].getName)
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(code = code"""
      ${leftGen.code}
      if (${leftGen.isNull}) {
        throw graft.functions.SpanCorruptExpr.nullIdError();
      }
      ${rightGen.code}
      boolean ${ev.isNull} = ${rightGen.isNull};
      $javaType ${ev.value} = ${CodeGenerator.defaultValue(dataType)};
      if (!${ev.isNull}) {
        ${ev.value} = graft.functions.SpanCorruptExpr.corruptRow(
          ${leftGen.value}.toString(), ${rightGen.value}, $rateK, $saltRef);
      }
    """)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SpanCorruptExpr {

  private val MaxSpan = 3

  /** The null-id raise (also called from generated code — public). */
  def nullIdError(): IllegalArgumentException =
    new IllegalArgumentException(
      "span_corrupt: null id — assign ids before corrupting")

  val outType: StructType = StructType(Seq(
    StructField("inp", StringType, nullable = false),
    StructField("tgt", StringType, nullable = false),
    StructField("nm", IntegerType, nullable = false)))

  private val md5Local =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  /** EXACTLY `Sampling.hash32(key, salt)`: the first 8 hex digits of
    * md5(key ":" salt) as an unsigned 32-bit value. */
  private def hash32(key: String, salt: String): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest((key + ":" + salt)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
      ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
  }

  /** One document's corruption — see the class doc for the semantics
    * replayed. */
  def corruptRow(idStr: String, toks: ArrayData, rateK: Int,
      salt: String): InternalRow = {
    val n = toks.numElements()
    // non-empty tokens only (the spec filters before zipping)
    val words = new java.util.ArrayList[String](n)
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val w = toks.getUTF8String(i).toString
        if (w.nonEmpty) words.add(w)
      }
      i += 1
    }
    val m = words.size()
    val starts = new Array[Boolean](m)
    val lens = new Array[Int](m)
    i = 0
    while (i < m) {
      val key = idStr + ":" + (i + 1)
      starts(i) = hash32(key, salt) % rateK == 0
      lens(i) = (hash32(key, salt + ":len") % MaxSpan).toInt + 1
      i += 1
    }
    val inp = new java.lang.StringBuilder(64)
    val tgt = new java.lang.StringBuilder(64)
    var k = -1
    var prev = false
    var nm = 0
    i = 0
    while (i < m) {
      val masked = (starts(i) && lens(i) >= 1) ||
        (i >= 1 && starts(i - 1) && lens(i - 1) >= 2) ||
        (i >= 2 && starts(i - 2) && lens(i - 2) >= 3)
      if (!masked) {
        if (inp.length > 0) inp.append(' ')
        inp.append(words.get(i))
        prev = false
      } else {
        if (!prev) {
          k += 1
          val sent = "<extra_id_" + k + ">"
          if (inp.length > 0) inp.append(' ')
          inp.append(sent)
          if (tgt.length > 0) tgt.append(' ')
          tgt.append(sent)
        }
        if (tgt.length > 0) tgt.append(' ')
        tgt.append(words.get(i))
        prev = true
        nm += 1
      }
      i += 1
    }
    InternalRow(UTF8String.fromString(inp.toString),
      UTF8String.fromString(tgt.toString), nm)
  }

  /** Column entry point: `(inp, tgt, nm)` struct per row. */
  def span_corrupt(id: Column, toks: Column, rateK: Int,
      salt: String): Column =
    GraftSqlBridge.column(SpanCorruptExpr(
      GraftSqlBridge.expression(id), GraftSqlBridge.expression(toks),
      rateK, salt))
}
