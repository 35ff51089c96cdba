package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.{coalesce, lit}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** BPE encoding of a text column under a trained merge table, as ONE
  * native expression — the whole tokenize → char-split → rank-ordered
  * merge folds → join pipeline in a single imperative pass per row.
  *
  * The HOF formulation it replaces (operators.Bpe.encodeCol: a
  * `transform` whose lambda folds `nMerges` nested `aggregate` layers,
  * each rebuilding its accumulator array per element) runs interpreted
  * and copies O(len) arrays per step — measured ~7 s for 5 000 docs ×
  * 8 merges on the streaming path; this expression is one allocation-
  * light loop, codegen'd into the row loop, and is pinned bit-identical
  * to the HOF form in BpeSpec and by the shared t_bpe_encode /
  * st_bpe_encode SQL oracle.
  *
  * Semantics replicated EXACTLY: whitespace runs collapse to one space
  * (Java `\s+` — the same regex Spark's regexp_replace compiles), text
  * lowercased (ROOT locale — Spark's UTF8String lowercase), tokens
  * split on single spaces with empties dropped, each token split into
  * code-point symbols plus the `</w>` terminal, each merge applied as
  * one greedy left-to-right carry pass in rank order, all subword
  * streams joined by single spaces. The expression null-propagates;
  * the [[BpeEncodeExpr.bpe_encode]] entry point coalesces a null text
  * to `""` — the `concat_ws` behavior of the HOF form, so the two
  * paths can never diverge on a null. */
case class BpeEncodeExpr(child: Expression,
    merges: Seq[(String, String)]) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bpe_encode needs a string argument, got ${child.dataType}")

  // flattened (left0, right0, left1, right1, …) in rank order — one
  // flat reference object for codegen
  private lazy val table: Array[String] =
    merges.flatMap(m => Seq(m._1, m._2)).toArray

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      BpeEncodeExpr.encode(input.asInstanceOf[UTF8String].toString, table))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val tbl = ctx.addReferenceObj("bpeMerges", table, "java.lang.String[]")
    nullSafeCodeGen(ctx, ev, str => {
      s"""
         |${ev.value} = UTF8String.fromString(
         |  graft.functions.BpeEncodeExpr.encode($str.toString(), $tbl));
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object BpeEncodeExpr {

  private val Eow = "</w>"

  /** The whole per-row pipeline, shared by eval and codegen. `table`
    * is the flattened (left0, right0, left1, right1, …) merge list in
    * rank order. */
  def encode(text: String, table: Array[String]): String = {
    val norm = text.replaceAll("\\s+", " ")
      .toLowerCase(java.util.Locale.ROOT)
    val out = new java.lang.StringBuilder(norm.length * 2)
    var start = 0
    val n = norm.length
    var wrote = false
    while (start <= n) {
      val sp = norm.indexOf(' ', start)
      val end = if (sp < 0) n else sp
      if (end > start) {
        val syms = encodeWord(norm, start, end, table)
        var i = 0
        while (i < syms.size()) {
          if (wrote) out.append(' ')
          out.append(syms.get(i))
          wrote = true
          i += 1
        }
      }
      start = end + 1
      if (sp < 0) start = n + 1
    }
    out.toString
  }

  /** One word [from, until) → its subword symbols after every merge. */
  private def encodeWord(s: String, from: Int, until: Int,
      table: Array[String]): java.util.ArrayList[String] = {
    var syms = new java.util.ArrayList[String]((until - from) + 1)
    var i = from
    while (i < until) {
      val cp = s.codePointAt(i)
      val len = Character.charCount(cp)
      syms.add(s.substring(i, i + len))
      i += len
    }
    syms.add(Eow)
    var m = 0
    while (m < table.length) {
      val left = table(m)
      val right = table(m + 1)
      // greedy left-to-right carry pass — operators.Bpe.applyMerge
      val next = new java.util.ArrayList[String](syms.size())
      var carry: String = null
      var j = 0
      while (j < syms.size()) {
        val x = syms.get(j)
        if (carry == null) carry = x
        else if (carry == left && x == right) {
          next.add(left + right); carry = null
        } else { next.add(carry); carry = x }
        j += 1
      }
      if (carry != null) next.add(carry)
      syms = next
      m += 2
    }
    syms
  }

  /** Column-level entry point — `""` for null text, like the HOF
    * form's concat_ws. */
  def bpe_encode(text: Column, merges: Seq[(String, String)]): Column =
    coalesce(GraftSqlBridge.column(
      BpeEncodeExpr(GraftSqlBridge.expression(text), merges)), lit(""))
}
