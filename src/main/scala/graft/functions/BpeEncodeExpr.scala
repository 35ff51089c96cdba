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

  // one shared reference object for eval and codegen: the flat merge
  // list plus its lazily-built (left → right → rank) lookup, so the
  // per-word cost is independent of the merge count
  private lazy val table: BpeEncodeExpr.Table =
    new BpeEncodeExpr.Table(merges.flatMap(m => Seq(m._1, m._2)).toArray)

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      BpeEncodeExpr.encode(input.asInstanceOf[UTF8String].toString, table))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val tbl = ctx.addReferenceObj("bpeMerges", table,
      classOf[BpeEncodeExpr.Table].getName)
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

  /** The merge table as the expression's reference object: the flat
    * (left0, right0, left1, right1, …) list in rank order plus a
    * lazily-built nested (left → right → 1-based rank) hash lookup.
    * The lookup is what makes encoding cost INDEPENDENT of the
    * vocabulary size: a word only ever queries the ranks of its own
    * ≤len adjacent pairs instead of scanning all merges. Nested maps
    * (not a tuple key) so a pair lookup allocates nothing. The flat
    * array is what serializes to executors; the lookup rebuilds lazily
    * per JVM (Scala lazy val — thread-safe). */
  final class Table(val flat: Array[String]) extends Serializable {
    @transient lazy val ranks: java.util.HashMap[String,
        java.util.HashMap[String, Array[Int]]] = {
      val m = new java.util.HashMap[String,
        java.util.HashMap[String, Array[Int]]]()
      var i = 0
      while (i < flat.length) {
        val inner = m.computeIfAbsent(flat(i),
          _ => new java.util.HashMap[String, Array[Int]]())
        // a pair CAN legitimately recur at a later rank (a different
        // derivation of the same left string re-creates occurrences
        // after the first pass) — keep every rank, ascending, so the
        // sequential semantics replay exactly
        val prev = inner.get(flat(i + 1))
        val rank = i / 2 + 1
        inner.put(flat(i + 1),
          if (prev == null) Array(rank) else prev :+ rank)
        i += 2
      }
      m
    }
  }

  /** Lowercase with EXACTLY `UTF8String.toLowerCase`'s semantics — the
    * path the HOF form takes through Spark's `lower()`: a pure-ASCII
    * string lowercases per-char (`Character.toLowerCase` on ASCII);
    * any non-ASCII char routes the WHOLE string through
    * `String.toLowerCase()` under the JVM default locale
    * (UTF8String.toLowerCaseSlow). Locale.ROOT here would diverge from
    * the HOF form on tr/az/lt default-locale JVMs for non-ASCII text
    * containing 'I' — the two paths must be bit-identical on every
    * JVM, so the quirk is replicated, not "fixed". */
  private def lowerLikeUtf8(s: String): String = {
    var i = 0
    val n = s.length
    while (i < n) {
      if (s.charAt(i) >= 0x80) return s.toLowerCase()
      i += 1
    }
    val out = new Array[Char](n)
    i = 0
    while (i < n) {
      out(i) = Character.toLowerCase(s.charAt(i))
      i += 1
    }
    new String(out)
  }

  /** The whole per-row pipeline, shared by eval and codegen. */
  def encode(text: String, table: Table): String = {
    val norm = lowerLikeUtf8(text.replaceAll("\\s+", " "))
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

  /** One word [from, until) → its subword symbols after every merge.
    *
    * Pair-rank lookup, NOT a scan over the merge list: the sequential
    * spec ("for each merge in rank order, one greedy left-to-right
    * pass") is equivalent to "repeatedly apply the lowest-rank merge
    * STRICTLY ABOVE the last applied rank that is present among the
    * word's adjacent pairs" — skipping an absent merge is a no-op pass,
    * and one pass can never create new occurrences of its own pair
    * (the merged symbol l⧺r equals neither l nor r), so nothing below
    * the moving floor is ever missed. Each iteration scans the ≤len
    * live pairs against the hash lookup; total cost is O(len·applied),
    * independent of the vocabulary size — at a 32k-merge table this is
    * the difference between ~len and ~32k·len array passes per word.
    * Bit-identical to [[graft.operators.Bpe.encodeCol]]'s fold (BpeSpec
    * pins parity at ≥256 merges). */
  private def encodeWord(s: String, from: Int, until: Int,
      table: Table): java.util.ArrayList[String] = {
    var syms = new java.util.ArrayList[String]((until - from) + 1)
    var i = from
    while (i < until) {
      val cp = s.codePointAt(i)
      val len = Character.charCount(cp)
      syms.add(s.substring(i, i + len))
      i += len
    }
    syms.add(Eow)
    val ranks = table.ranks
    var last = 0
    var done = ranks.isEmpty
    while (!done) {
      // lowest eligible (rank > last) among the word's adjacent pairs
      var best = Integer.MAX_VALUE
      var j = 0
      val n = syms.size()
      while (j < n - 1) {
        val inner = ranks.get(syms.get(j))
        if (inner != null) {
          val rs = inner.get(syms.get(j + 1))
          if (rs != null) {
            var k = 0
            while (k < rs.length) {
              val r = rs(k)
              if (r > last && r < best) { best = r; k = rs.length }
              else k += 1
            }
          }
        }
        j += 1
      }
      if (best == Integer.MAX_VALUE) done = true
      else {
        val left = table.flat(2 * (best - 1))
        val right = table.flat(2 * (best - 1) + 1)
        // greedy left-to-right carry pass — operators.Bpe.applyMerge
        val next = new java.util.ArrayList[String](syms.size())
        var carry: String = null
        var m = 0
        while (m < syms.size()) {
          val x = syms.get(m)
          if (carry == null) carry = x
          else if (carry == left && x == right) {
            next.add(left + right); carry = null
          } else { next.add(carry); carry = x }
          m += 1
        }
        if (carry != null) next.add(carry)
        syms = next
        last = best
      }
    }
    syms
  }

  /** Column-level entry point — `""` for null text, like the HOF
    * form's concat_ws. */
  def bpe_encode(text: Column, merges: Seq[(String, String)]): Column =
    coalesce(GraftSqlBridge.column(
      BpeEncodeExpr(GraftSqlBridge.expression(text), merges)), lit(""))
}
