package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** SPECIAL (reserved/added) tokens — the registry layer every real
  * trainer puts on top of a learned tokenizer (HuggingFace
  * `added_tokens`, SentencePiece control symbols, GPT-2's
  * `<|endoftext|>`): a bounded list of literal strings that segment the
  * text ATOMICALLY before any pretokenization, are never merged with or
  * split by adjacent text, carry dedicated ids ABOVE the learned
  * vocabulary, and are excluded from the fit corpus. Without this, a
  * chat tag like `<|user|>` fragments into ordinary byte-level ids and
  * a document containing the literal tag string is indistinguishable
  * from a real boundary.
  *
  * The SCAN is leftmost-first, longest-match-on-ties: the earliest
  * occurrence of any special wins; two specials starting at the same
  * offset resolve to the longer one (a special that is a strict prefix
  * of another never shadows it). Fully deterministic and
  * engine-replayable — a SQL oracle reconstructs the segments by plain
  * string arithmetic whenever the specials are non-overlapping in the
  * fixture (the gates' case).
  *
  * 100 TB shape: the specials list is a trainer artifact (a handful of
  * strings) riding in the expression tree like a merge table — both
  * expressions here are pure codegen'd narrow maps, zero shuffles,
  * stream-safe. */
object SpecialTokens {

  /** Validate a specials list: non-empty strings, no duplicates. */
  def validate(specials: Seq[String]): Unit = {
    require(specials.nonEmpty, "specials must be a non-empty list")
    require(specials.forall(_.nonEmpty),
      "a special token cannot be the empty string")
    require(specials.distinct.size == specials.size,
      s"duplicate special tokens: ${specials.mkString(", ")}")
  }

  /** Earliest occurrence of any special at or after `from`:
    * `(start << 32) | index`, or -1 when none occurs. Ties at the same
    * start resolve to the LONGEST special. One-shot form — loops use
    * [[Scan]], which memoizes each special's next occurrence so a
    * whole-string pass costs O(specials · length) TOTAL instead of per
    * segment advance (at a 64-sentinel T5 list that is the difference
    * between linear and quadratic-ish row cost). */
  def nextSpecial(s: String, from: Int, specials: Array[String]): Long =
    new Scan(s, specials).next(from)

  /** Memoized multi-pattern scanner over one string: per special, the
    * last found occurrence is cached and re-searched only once the
    * cursor passes it — each special's indexOf advances monotonically,
    * so the amortized whole-string cost is one scan per special. */
  final class Scan(s: String, specials: Array[String]) {
    // -2 = not yet searched; -1 = absent from here on
    private val memo = Array.fill(specials.length)(-2)

    def next(from: Int): Long = {
      var bestStart = Int.MaxValue
      var bestIdx = -1
      var k = 0
      while (k < specials.length) {
        var i = memo(k)
        if (i == -2 || (i >= 0 && i < from)) {
          i = s.indexOf(specials(k), from)
          memo(k) = i
        }
        if (i >= 0 && (i < bestStart || (i == bestStart &&
            specials(k).length > specials(bestIdx).length))) {
          bestStart = i
          bestIdx = k
        }
        k += 1
      }
      if (bestIdx < 0) -1L else (bestStart.toLong << 32) | bestIdx.toLong
    }
  }

  /** Split `s` around special occurrences. `keepSpecials = false`
    * returns only the non-special segments (the FIT-corpus view —
    * specials contribute no merge/piece statistics); `true` interleaves
    * the special literals in occurrence order (the ENCODE view — a
    * returned element equal to a special IS that special: segments can
    * never contain one as a substring, by construction of the scan).
    * Empty segments (adjacent specials, leading/trailing specials) are
    * dropped either way. */
  def split(s: String, specials: Array[String],
      keepSpecials: Boolean): GenericArrayData = {
    val out = new java.util.ArrayList[UTF8String](4)
    val scan = new Scan(s, specials)
    var p = 0
    val n = s.length
    while (p < n) {
      val nx = scan.next(p)
      if (nx < 0) {
        out.add(UTF8String.fromString(s.substring(p, n)))
        p = n
      } else {
        val start = (nx >>> 32).toInt
        val idx = (nx & 0xFFFFFFFFL).toInt
        if (start > p)
          out.add(UTF8String.fromString(s.substring(p, start)))
        if (keepSpecials)
          out.add(UTF8String.fromString(specials(idx)))
        p = start + specials(idx).length
      }
    }
    val arr = new Array[Any](out.size())
    var i = 0
    while (i < arr.length) { arr(i) = out.get(i); i += 1 }
    new GenericArrayData(arr)
  }

  /** Non-special segments column (null-propagating) — the fit-corpus
    * view: explode it to train a tokenizer with the specials' literal
    * text excluded from the statistics. */
  def special_segments(text: Column, specials: Seq[String]): Column = {
    validate(specials)
    GraftSqlBridge.column(SpecialSplitExpr(
      GraftSqlBridge.expression(text), specials, keepSpecials = false))
  }

  /** Interleaved (segment | special) column (null-propagating) — the
    * encode view: map special elements to their reserved ids and encode
    * segment elements normally; concatenation restores the input. */
  def special_split(text: Column, specials: Seq[String]): Column = {
    validate(specials)
    GraftSqlBridge.column(SpecialSplitExpr(
      GraftSqlBridge.expression(text), specials, keepSpecials = true))
  }

  /** The FIT-CORPUS view of a frame: `textCol` replaced by its
    * non-special segments, one row per segment (specials contribute
    * zero statistics to any tokenizer fit — the exclusion every
    * trainer applies to added tokens). `specials` empty ⇒ the frame
    * unchanged. Narrow map + explode, stream-safe. */
  def segmentedCorpus(df: org.apache.spark.sql.DataFrame,
      textCol: String, specials: Seq[String])
      : org.apache.spark.sql.DataFrame =
    if (specials.isEmpty) df
    else df.select(org.apache.spark.sql.functions.explode(
      special_segments(org.apache.spark.sql.functions.col(textCol),
        specials)).as(textCol))
}

/** The splitter as a native expression — see [[SpecialTokens.split]]. */
case class SpecialSplitExpr(child: Expression, specials: Seq[String],
    keepSpecials: Boolean) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"special_split needs a string argument, got ${child.dataType}")

  private lazy val arr: Array[String] = specials.toArray

  override def nullSafeEval(input: Any): Any =
    SpecialTokens.split(
      input.asInstanceOf[UTF8String].toString, arr, keepSpecials)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    // the Java ARRAY cast syntax, not Class.getName's "[Ljava.lang…;"
    // (janino cannot parse the JVM-internal form and would silently
    // drop the whole stage out of codegen)
    val sp = ctx.addReferenceObj("specials", arr, "java.lang.String[]")
    nullSafeCodeGen(ctx, ev, str => {
      s"""
         |${ev.value} = graft.functions.SpecialTokens.split(
         |  $str.toString(), $sp, $keepSpecials);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}
