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
    merges: Seq[(String, String)],
    byteLevel: Boolean = false) extends UnaryExpression {

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

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    UTF8String.fromString(
      if (byteLevel) BpeEncodeExpr.encodeBytes(s, table)
      else BpeEncodeExpr.encode(s, table))
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val tbl = ctx.addReferenceObj("bpeMerges", table,
      classOf[BpeEncodeExpr.Table].getName)
    val fn = if (byteLevel) "encodeBytes" else "encode"
    nullSafeCodeGen(ctx, ev, str => {
      s"""
         |${ev.value} = UTF8String.fromString(
         |  graft.functions.BpeEncodeExpr.$fn($str.toString(), $tbl));
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

/** Lossless inverse of the BYTE-LEVEL encode: strips the single-space
  * subword separators, maps each alphabet char back to its byte, and
  * UTF-8-decodes — `decode ∘ encode` is byte-identical to the input
  * for any string (BpeSpec pins the property). A character outside the
  * 324-char byte alphabet raises with the character: the stream being
  * decoded was produced under a DIFFERENT tokenizer, the same drift
  * class [[graft.operators.Vocab.decodeNarrow]] raises on. */
case class BpeByteDecodeExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bpe_decode_bytes needs a string argument, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      BpeEncodeExpr.decodeBytes(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str => {
      s"""
         |${ev.value} = UTF8String.fromString(
         |  graft.functions.BpeEncodeExpr.decodeBytes($str.toString()));
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

/** [[BpeEncodeExpr]]'s byte-level pipeline emitting TOKEN IDS
  * (`array<int>`, GPT-2 id layout: 256 byte tokens then merges by
  * rank) — the shipped-artifact form; [[BpeIdsDecodeExpr]] inverts it
  * byte-exactly. */
case class BpeIdsExpr(child: Expression,
    merges: Seq[(String, String)],
    specials: Seq[String] = Nil) extends UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bpe_encode_ids needs a string argument, got ${child.dataType}")

  private lazy val table: BpeEncodeExpr.Table =
    new BpeEncodeExpr.Table(
      merges.flatMap(m => Seq(m._1, m._2)).toArray, specials.toArray)

  override def nullSafeEval(input: Any): Any =
    BpeEncodeExpr.encodeIds(input.asInstanceOf[UTF8String].toString, table)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val tbl = ctx.addReferenceObj("bpeMerges", table,
      classOf[BpeEncodeExpr.Table].getName)
    nullSafeCodeGen(ctx, ev, str => {
      s"""
         |${ev.value} =
         |  graft.functions.BpeEncodeExpr.encodeIds($str.toString(), $tbl);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

/** Lossless inverse of [[BpeIdsExpr]] under the same merge table. */
case class BpeIdsDecodeExpr(child: Expression,
    merges: Seq[(String, String)],
    specials: Seq[String] = Nil) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.IntegerType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_decode_ids needs array<int>, got $other")
  }

  private lazy val table: BpeEncodeExpr.Table =
    new BpeEncodeExpr.Table(
      merges.flatMap(m => Seq(m._1, m._2)).toArray, specials.toArray)

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(BpeEncodeExpr.decodeIds(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      table))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val tbl = ctx.addReferenceObj("bpeMerges", table,
      classOf[BpeEncodeExpr.Table].getName)
    nullSafeCodeGen(ctx, ev, arr => {
      s"""
         |${ev.value} = UTF8String.fromString(
         |  graft.functions.BpeEncodeExpr.decodeIds($arr, $tbl));
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

/** A string's byte-alphabet spelling (one mapped char per UTF-8 byte,
  * [[BpeEncodeExpr.byteAlphabet]]) — the trainer-side symbol speller
  * ([[graft.operators.Bpe]] byteFrame); exact for every byte, unlike a
  * `translate` chain, which cannot expand a multi-byte char. */
case class BpeByteMapExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bpe_byte_map needs a string argument, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      BpeEncodeExpr.byteMap(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str => {
      s"""
         |${ev.value} = UTF8String.fromString(
         |  graft.functions.BpeEncodeExpr.byteMap($str.toString()));
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object BpeEncodeExpr {

  private val Eow = "</w>"

  /** The GPT-2 byte→printable-unicode alphabet (Radford et al. 2019,
    * `encoder.py bytes_to_unicode`, public): printable latin bytes map
    * to themselves (`!`..`~`, `¡`..`¬`, `®`..`ÿ`), the 68 others
    * (controls, space, DEL, soft hyphen …) shift to 256+n in byte
    * order — so space is `Ġ` (U+0120), newline `Ċ`, tab `ĉ`. Every
    * byte gets a DISTINCT printable char, which is what makes merge
    * symbols plain strings and the single-space subword separator
    * unambiguous (0x20 never maps to itself). */
  val byteAlphabet: Array[Char] = {
    val keep = ((33 to 126) ++ (161 to 172) ++ (174 to 255)).toSet
    val arr = new Array[Char](256)
    var n = 0
    var b = 0
    while (b < 256) {
      if (keep(b)) arr(b) = b.toChar
      else { arr(b) = (256 + n).toChar; n += 1 }
      b += 1
    }
    arr
  }

  /** alphabet char → byte value, -1 for chars outside the alphabet. */
  private val inverseAlphabet: Array[Int] = {
    val arr = Array.fill(324)(-1)
    var b = 0
    while (b < 256) { arr(byteAlphabet(b).toInt) = b; b += 1 }
    arr
  }

  /** The merge table as the expression's reference object: the flat
    * (left0, right0, left1, right1, …) list in rank order plus a
    * lazily-built nested (left → right → 1-based rank) hash lookup.
    * The lookup is what makes encoding cost INDEPENDENT of the
    * vocabulary size: a word only ever queries the ranks of its own
    * ≤len adjacent pairs instead of scanning all merges. Nested maps
    * (not a tuple key) so a pair lookup allocates nothing. The flat
    * array is what serializes to executors; the lookup rebuilds lazily
    * per JVM (Scala lazy val — thread-safe). */
  final class Table(val flat: Array[String],
      val specials: Array[String]) extends Serializable {

    def this(flat: Array[String]) = this(flat, Array.empty[String])

    /** First special id: specials sit ABOVE the text vocabulary —
      * bytes 0-255, merges 256..255+nMerges, special k at
      * 256+nMerges+k (the HF added_tokens id convention). */
    def specialBase: Int = 256 + flat.length / 2

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

    /** The GPT-2 id space over this table: ids 0..255 are the byte
      * alphabet (id = byte value), id 255+rank is merge `rank`'s merged
      * string. A merged string recurring at a later rank keeps its
      * FIRST id (putIfAbsent in rank order) — same token, one id. */
    @transient lazy val symIds: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer]()
      var b = 0
      while (b < 256) {
        m.put(String.valueOf(byteAlphabet(b)), Integer.valueOf(b))
        b += 1
      }
      var i = 0
      while (i < flat.length) {
        m.putIfAbsent(flat(i) + flat(i + 1),
          Integer.valueOf(255 + i / 2 + 1))
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
    val syms = new java.util.ArrayList[String]((until - from) + 1)
    var i = from
    while (i < until) {
      val cp = s.codePointAt(i)
      val len = Character.charCount(cp)
      syms.add(s.substring(i, i + len))
      i += len
    }
    syms.add(Eow)
    applyMerges(syms, table)
  }

  /** The pair-rank merge loop shared by the word-level and byte-level
    * encoders (see [[encodeWord]]'s equivalence argument). */
  private def applyMerges(syms0: java.util.ArrayList[String],
      table: Table): java.util.ArrayList[String] = {
    var syms = syms0
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

  // ---- byte-level, case-preserving mode (r11) ----
  //
  // The word-level pipeline above is the reference-shaped default and
  // is LOSSY: it lowercases and collapses whitespace before encoding,
  // so decode returns a normalized stream. Production tokenizers
  // (GPT-2 §2.2, LLaMA/SentencePiece byte-fallback) are byte-level
  // with a regex pre-tokenizer and lossless round-trip — the mode a
  // shipped training artifact actually needs. Here: the text is cut
  // into PRETOKENS by [[pretokenPattern]] (merges never cross
  // pretoken boundaries), each pretoken's UTF-8 bytes map through
  // [[byteAlphabet]] to one printable char per byte, the same
  // pair-rank merge loop applies (no `</w>` — the boundary IS the
  // pretoken end, GPT-2-style), and all subwords join with single
  // spaces (never an alphabet char). decode ∘ encode is byte-identical
  // for ANY string (BpeSpec property).

  /** The pre-tokenizer, as a regex both Java (`Pattern`, the training
    * frame) and RE2 (DuckDB, the gate oracle) interpret identically:
    * letter runs, digit runs, non-alphanumeric-non-space runs — each
    * optionally absorbing ONE immediately preceding space, the GPT-2
    * `Ġword` device — and whitespace runs otherwise. Deviation from
    * GPT-2's exact pattern, documented: RE2 has no lookahead, so
    * GPT-2's `\s+(?!\S)` trailing-space split and `'s|'t|…`
    * contraction list are dropped; classes are ASCII (`[A-Za-z]`, not
    * `\p{L}`), so accented letters fall into the "other" run — a
    * merge-quality trade only, NEVER a correctness one: any partition
    * of the text concatenates back losslessly. Leftmost-first ordered
    * alternation + greedy runs give both engines the same cut. */
  val pretokenPattern: String =
    " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 \\t\\n\\x0B\\f\\r]+|[ \\t\\n\\x0B\\f\\r]+"

  // the scanner's character classes — EXACTLY the regex's ASCII sets
  // (Java \s = [ \t\n\x0B\f\r])
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' ||
      c == '\r'
  private def isLetter(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')
  private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'

  /** End index of the pretoken starting at `i` — the hand-rolled form
    * of one [[pretokenPattern]] match (leftmost-first alternation,
    * greedy runs), pinned equal to `Pattern.matcher` by a BpeSpec
    * property over random strings. */
  private def pretokenEnd(s: String, i: Int): Int = {
    val n = s.length
    val c = s.charAt(i)
    def run(from: Int, cls: Char => Boolean): Int = {
      var j = from
      while (j < n && cls(s.charAt(j))) j += 1
      j
    }
    if (c == ' ' && i + 1 < n && !isWs(s.charAt(i + 1))) {
      // ' ?' absorbed into the following class run
      val c1 = s.charAt(i + 1)
      if (isLetter(c1)) run(i + 1, isLetter)
      else if (isDigit(c1)) run(i + 1, isDigit)
      else run(i + 1, ch => !isLetter(ch) && !isDigit(ch) && !isWs(ch))
    } else if (isWs(c)) run(i, isWs)
    else if (isLetter(c)) run(i, isLetter)
    else if (isDigit(c)) run(i, isDigit)
    else run(i, ch => !isLetter(ch) && !isDigit(ch) && !isWs(ch))
  }

  /** One pretoken's UTF-8 bytes as mapped single-char symbols. */
  private def byteSyms(s: String, from: Int, until: Int)
      : java.util.ArrayList[String] = {
    val bytes = s.substring(from, until)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val syms = new java.util.ArrayList[String](bytes.length)
    var i = 0
    while (i < bytes.length) {
      syms.add(String.valueOf(byteAlphabet(bytes(i) & 0xFF)))
      i += 1
    }
    syms
  }

  /** The whole byte-level per-row pipeline, shared by eval and codegen:
    * pretokenize → byte-map → pair-rank merges → subwords joined by
    * single spaces. No normalization anywhere — case, whitespace and
    * every byte survive into the symbols. */
  def encodeBytes(text: String, table: Table): String = {
    val out = new java.lang.StringBuilder(text.length * 2)
    var wrote = false
    var i = 0
    val n = text.length
    while (i < n) {
      val end = pretokenEnd(text, i)
      val syms = applyMerges(byteSyms(text, i, end), table)
      var j = 0
      while (j < syms.size()) {
        if (wrote) out.append(' ')
        out.append(syms.get(j))
        wrote = true
        j += 1
      }
      i = end
    }
    out.toString
  }

  /** [[encodeBytes]] emitting TOKEN IDS — the artifact a training run
    * actually consumes: id = byte value for alphabet symbols, 255+rank
    * for merged symbols ([[Table.symIds]] — the GPT-2 id layout:
    * 256 byte tokens, then merges in rank order), and — when the table
    * carries SPECIAL tokens — 256+nMerges+k for special k. Specials
    * segment the text atomically BEFORE pretokenization
    * ([[SpecialTokens]] leftmost-first/longest-match scan): a special
    * occurrence is exactly one reserved id, never merged with or split
    * by adjacent text, and the literal tag text never reaches the merge
    * loop. Same pretokens, same merge loop for the plain segments; one
    * int per subword instead of a joined string. */
  def encodeIds(text: String, table: Table)
      : org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val out = new java.util.ArrayList[Integer](text.length)
    val specials = table.specials
    val scan = if (specials.length == 0) null
      else new SpecialTokens.Scan(text, specials)
    var p = 0
    val n = text.length
    while (p < n) {
      val nx = if (scan == null) -1L else scan.next(p)
      if (nx < 0) {
        encodeIdsSegment(text, p, n, table, out)
        p = n
      } else {
        val start = (nx >>> 32).toInt
        val idx = (nx & 0xFFFFFFFFL).toInt
        if (start > p) encodeIdsSegment(text, p, start, table, out)
        out.add(Integer.valueOf(table.specialBase + idx))
        p = start + specials(idx).length
      }
    }
    val arr = new Array[Int](out.size())
    var k = 0
    while (k < arr.length) { arr(k) = out.get(k).intValue(); k += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }

  /** One plain segment [from, until) through pretokenize → merges →
    * ids. Clamping [[pretokenEnd]] to `until` reproduces the
    * standalone pretokenization of the segment exactly: runs stop at
    * the boundary either way, and the one lookahead (space absorbed
    * into a following class run) yields the same single-space pretoken
    * whether the next char is past `until` or past end-of-string. */
  private def encodeIdsSegment(text: String, from: Int, until: Int,
      table: Table, out: java.util.ArrayList[Integer]): Unit = {
    val ids = table.symIds
    var i = from
    while (i < until) {
      val end = math.min(pretokenEnd(text, i), until)
      val syms = applyMerges(byteSyms(text, i, end), table)
      var j = 0
      while (j < syms.size()) {
        val id = ids.get(syms.get(j))
        if (id == null) throw new IllegalStateException(
          s"bpe_encode_ids: symbol '${syms.get(j)}' has no id — " +
            "merge table inconsistent")
        out.add(id)
        j += 1
      }
      i = end
    }
  }

  /** Lossless inverse of [[encodeIds]]: id < 256 → the byte, id
    * 255+rank → merge `rank`'s merged string's bytes, id
    * 256+nMerges+k → special k's literal text (UTF-8 bytes — decode ∘
    * encode stays byte-identical with specials present). An id outside
    * [0, 255+nMerges+nSpecials] raises with the id — wrong-vocabulary
    * drift, the [[graft.operators.Vocab.decodeNarrow]] discipline. */
  def decodeIds(ids: org.apache.spark.sql.catalyst.util.ArrayData,
      table: Table): String = {
    val nMerges = table.flat.length / 2
    val maxId = 255 + nMerges + table.specials.length
    val bytes = new java.io.ByteArrayOutputStream(ids.numElements() * 2)
    var i = 0
    while (i < ids.numElements()) {
      val id = ids.getInt(i)
      if (id < 0 || id > maxId)
        throw new IllegalArgumentException(
          s"bpe_decode_ids: id $id outside [0, $maxId] — " +
            "stream from a different vocabulary?")
      if (id >= 256 + nMerges) {
        val sp = table.specials(id - 256 - nMerges)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        bytes.write(sp, 0, sp.length)
      } else {
        val sym =
          if (id < 256) String.valueOf(byteAlphabet(id))
          else table.flat(2 * (id - 256)) + table.flat(2 * (id - 256) + 1)
        var c = 0
        while (c < sym.length) {
          bytes.write(inverseAlphabet(sym.charAt(c).toInt))
          c += 1
        }
      }
      i += 1
    }
    new String(bytes.toByteArray,
      java.nio.charset.StandardCharsets.UTF_8)
  }

  /** [[encodeBytes]]'s lossless inverse — see [[BpeByteDecodeExpr]]. */
  def decodeBytes(enc: String): String = {
    val bytes = new java.io.ByteArrayOutputStream(enc.length)
    var i = 0
    val n = enc.length
    while (i < n) {
      val c = enc.charAt(i)
      if (c != ' ') {
        val b = if (c.toInt < inverseAlphabet.length)
          inverseAlphabet(c.toInt) else -1
        if (b < 0) throw new IllegalArgumentException(
          s"bpe_decode_bytes: char '$c' (U+${"%04X".format(c.toInt)}) " +
            "is not in the byte alphabet — stream from a different " +
            "tokenizer?")
        bytes.write(b)
      }
      i += 1
    }
    new String(bytes.toByteArray,
      java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Java-regex pretokens of a string — the training-frame cut
    * ([[graft.operators.Bpe]] uses Spark's `regexp_extract_all` with
    * [[pretokenPattern]], which compiles this same Pattern); exposed
    * for the BpeSpec scanner≡regex property. */
  def pretokensByRegex(s: String): Seq[String] = {
    val m = java.util.regex.Pattern.compile(pretokenPattern).matcher(s)
    val out = Seq.newBuilder[String]
    while (m.find()) out += m.group()
    out.result()
  }

  /** Scanner pretokens (the encode path's cut) — BpeSpec pins this
    * equal to [[pretokensByRegex]]. */
  def pretokensByScanner(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < s.length) {
      val end = pretokenEnd(s, i)
      out += s.substring(i, end)
      i = end
    }
    out.result()
  }

  /** A string's byte-alphabet form (UTF-8 bytes → mapped chars) — the
    * symbol spelling the trainer and the oracle share. */
  def byteMap(s: String): String = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = new java.lang.StringBuilder(bytes.length)
    var i = 0
    while (i < bytes.length) {
      out.append(byteAlphabet(bytes(i) & 0xFF))
      i += 1
    }
    out.toString
  }

  /** Column-level entry point — `""` for null text, like the HOF
    * form's concat_ws. */
  def bpe_encode(text: Column, merges: Seq[(String, String)]): Column =
    coalesce(GraftSqlBridge.column(
      BpeEncodeExpr(GraftSqlBridge.expression(text), merges)), lit(""))

  /** Byte-level entry point — merges are over [[byteAlphabet]] symbol
    * strings; `""` for null text. */
  def bpe_encode_bytes(text: Column,
      merges: Seq[(String, String)]): Column =
    coalesce(GraftSqlBridge.column(
      BpeEncodeExpr(GraftSqlBridge.expression(text), merges,
        byteLevel = true)), lit(""))

  /** Lossless byte-level decode column (null-propagating). */
  def bpe_decode_bytes(enc: Column): Column =
    GraftSqlBridge.column(
      BpeByteDecodeExpr(GraftSqlBridge.expression(enc)))

  /** Byte-alphabet spelling column (null-propagating). */
  def byte_map(s: Column): Column =
    GraftSqlBridge.column(BpeByteMapExpr(GraftSqlBridge.expression(s)))

  /** Token-id encode column (`array<int>`; empty array for null text —
    * the id-stream analogue of bpe_encode's `""`). Non-empty
    * `specials` reserve atomic ids above the vocabulary
    * ([[SpecialTokens]]; id 256+nMerges+k for special k). */
  def bpe_encode_ids(text: Column,
      merges: Seq[(String, String)],
      specials: Seq[String] = Nil): Column = {
    if (specials.nonEmpty) SpecialTokens.validate(specials)
    coalesce(GraftSqlBridge.column(
      BpeIdsExpr(GraftSqlBridge.expression(text), merges, specials)),
      lit(Array.empty[Int]))
  }

  /** Token-id decode column under the same merge table (+ specials
    * list — a special id decodes to its literal text, so decode ∘
    * encode stays byte-identical with specials present;
    * null-propagating; out-of-range ids raise with the id). */
  def bpe_decode_ids(ids: Column,
      merges: Seq[(String, String)],
      specials: Seq[String] = Nil): Column = {
    if (specials.nonEmpty) SpecialTokens.validate(specials)
    GraftSqlBridge.column(
      BpeIdsDecodeExpr(GraftSqlBridge.expression(ids), merges, specials))
  }
}
