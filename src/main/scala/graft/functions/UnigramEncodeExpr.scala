package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM (SentencePiece-family, Kudo 2018) Viterbi segmentation of
  * a token array — the third tokenizer family's inner loop as a native
  * compiled expression (the WordPieceEncodeExpr recipe).
  *
  * Per word, minimum-cost segmentation over the piece vocabulary by
  * left-to-right dynamic programming; costs are INTEGER bit lengths
  * (the [[graft.operators.Surprisal]] `bitlen` surrogate for −log₂ p —
  * no libm, so a SQL oracle replays every DP cell exactly). The total
  * order at each DP cell is (cost ASC, piece count ASC, piece length
  * DESC) — fully deterministic, engine-portable. A word containing a
  * character outside the vocabulary collapses to one `[UNK]`. */
case class UnigramEncodeExpr(child: Expression,
    pieces: Seq[(String, Int)], maxPieceLen: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"unigram_encode needs array<string>, got $other")
  }

  private lazy val table: UnigramEncodeExpr.Model =
    new UnigramEncodeExpr.Model(
      pieces.map(_._1).toArray, pieces.map(_._2).toArray, maxPieceLen)

  override def nullSafeEval(input: Any): Any =
    UnigramEncodeExpr.encodeTokens(input.asInstanceOf[ArrayData], table)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val tbl = ctx.addReferenceObj("ugModel", table,
      classOf[UnigramEncodeExpr.Model].getName)
    nullSafeCodeGen(ctx, ev, arr => {
      s"""
         |${ev.value} =
         |  graft.functions.UnigramEncodeExpr.encodeTokens($arr, $tbl);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object UnigramEncodeExpr {

  val Unk = "[UNK]"

  /** `<0xXX>` byte-fallback piece spelling test (uppercase hex — the
    * [[graft.operators.Unigram.bytePiece]] convention). */
  def isBytePiece(p: String): Boolean = {
    def hx(c: Char) = (c >= '0' && c <= '9') || (c >= 'A' && c <= 'F')
    p.length == 6 && p.startsWith("<0x") && p.charAt(5) == '>' &&
      hx(p.charAt(3)) && hx(p.charAt(4))
  }

  /** Compiled model: piece → integer cost, plus the probe cap.
    * `<0xXX>` pieces are byte-fallback EDGE definitions, not text
    * pieces: they populate [[Model.byteCosts]] (per-byte decomposition
    * cost) and are excluded from the text lookup and the probe cap —
    * a literal "<0x41>" in a document segments through its characters
    * like any other text. */
  final class Model(ps: Array[String], costs: Array[Int],
      maxPieceLen: Int) extends Serializable {
    /** Per-byte fallback cost; null when the model has no byte pieces.
      * A partial byte table would silently re-introduce `[UNK]` on the
      * missing bytes, so anything between 0 and 256 pieces raises. */
    val byteCosts: Array[Int] = {
      val arr = new Array[Int](256)
      var n = 0
      ps.indices.foreach { i =>
        val p = ps(i)
        if (isBytePiece(p)) {
          arr(Integer.parseInt(p.substring(3, 5), 16)) = costs(i)
          n += 1
        }
      }
      if (n == 0) null
      else {
        require(n == 256,
          s"byte-fallback model carries $n of 256 <0xXX> pieces — " +
            "use Unigram.withByteFallback to add the full table")
        arr
      }
    }
    val cost: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer](ps.length * 2)
      ps.indices.foreach(i =>
        if (!isBytePiece(ps(i)) && !m.containsKey(ps(i)))
          m.put(ps(i), costs(i)))
      m
    }
    // lengths in CODE POINTS (Spark substring semantics — the units of
    // the SQL-oracle DP); UTF-16 units would mis-cap non-BMP pieces
    val maxLen: Int = math.min(maxPieceLen,
      ps.iterator.filterNot(isBytePiece)
        .map(p => p.codePointCount(0, p.length))
        .foldLeft(1)(math.max))
  }

  def encodeTokens(tokens: ArrayData, m: Model): ArrayData = {
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String](
      tokens.numElements() * 2)
    var i = 0
    val n = tokens.numElements()
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val w = tokens.getUTF8String(i).toString
        if (w.nonEmpty) segmentInto(w, m, out)
      }
      i += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  /** Viterbi DP: best(i) = min over piece lengths l of
    * (best(i−l).cost + cost(word[i−l..i]), best(i−l).n + 1, −l),
    * lexicographic — the exact order the SQL oracle's ROW_NUMBER
    * replays. */
  private def segmentInto(word: String, m: Model,
      out: scala.collection.mutable.ArrayBuffer[UTF8String]): Unit = {
    val u16 = word.length
    // DP positions are CODE POINTS (the spec DP uses Spark substring —
    // code-point units); bounds(k) = UTF-16 offset of code point k,
    // with the identity fast path for BMP-only words
    val len = word.codePointCount(0, u16)
    val bounds: Array[Int] =
      if (len == u16) null
      else {
        val b = new Array[Int](len + 1)
        var o = 0
        var k = 0
        while (k < len) { b(k) = o; o = word.offsetByCodePoints(o, 1); k += 1 }
        b(len) = u16
        b
      }
    @inline def off(k: Int): Int = if (bounds == null) k else bounds(k)
    val INF = Int.MaxValue / 2
    val cost = new Array[Int](len + 1)
    val np = new Array[Int](len + 1)
    val back = new Array[Int](len + 1) // chosen piece length at pos i
    val fb = new Array[Boolean](len + 1) // fallback edge chosen at pos i
    var i = 1
    while (i <= len) {
      cost(i) = INF; np(i) = INF; back(i) = 0; fb(i) = false
      var l = 1
      val hi = math.min(m.maxLen, i)
      while (l <= hi) {
        val c = m.cost.get(word.substring(off(i - l), off(i)))
        if (c != null && cost(i - l) < INF) {
          val tc = cost(i - l) + c.intValue()
          val tn = np(i - l) + 1
          // (cost ASC, pieces ASC, length DESC); scanning l ascending,
          // a strictly-better OR equal-with-longer-l candidate wins
          if (tc < cost(i) || (tc == cost(i) &&
              (tn < np(i) || (tn == np(i) && l > back(i))))) {
            cost(i) = tc; np(i) = tn; back(i) = l; fb(i) = false
          }
        }
        l += 1
      }
      // byte-fallback edge (when the model carries the <0xXX> table):
      // the single code point at [i-1, i) decomposes into its UTF-8
      // bytes at the per-byte penalty cost. Counts as ONE unit in the
      // tie order (like any edge — the SQL oracle's DP does the same);
      // evaluated after the real edges and winning only strictly, so a
      // covered character never falls back (the penalty sits above
      // every real cost by construction).
      if (m.byteCosts != null && cost(i - 1) < INF) {
        val bytes = word.substring(off(i - 1), off(i))
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        var bc = 0
        var bi = 0
        while (bi < bytes.length) { bc += m.byteCosts(bytes(bi) & 0xFF); bi += 1 }
        val tc = cost(i - 1) + bc
        val tn = np(i - 1) + 1
        if (tc < cost(i) || (tc == cost(i) &&
            (tn < np(i) || (tn == np(i) && 1 > back(i))))) {
          cost(i) = tc; np(i) = tn; back(i) = 1; fb(i) = true
        }
      }
      i += 1
    }
    if (cost(len) >= INF) { out += UTF8String.fromString(Unk); return }
    // backtrack, then emit left-to-right (fallback edges expand to
    // their byte pieces, appended reversed so the forward order holds)
    val rev = new scala.collection.mutable.ArrayBuffer[UTF8String](4)
    var p = len
    while (p > 0) {
      val l = back(p)
      if (fb(p)) {
        val bytes = word.substring(off(p - 1), off(p))
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        var k = bytes.length - 1
        while (k >= 0) {
          rev += UTF8String.fromString(
            graft.operators.Unigram.bytePiece(bytes(k) & 0xFF))
          k -= 1
        }
      } else {
        rev += UTF8String.fromString(word.substring(off(p - l), off(p)))
      }
      p -= l
    }
    var k = rev.length - 1
    while (k >= 0) { out += rev(k); k -= 1 }
  }

  /** Column-level entry point over a token array. */
  def ug_encode(tokens: Column, pieces: Seq[(String, Int)],
      maxPieceLen: Int): Column =
    GraftSqlBridge.column(UnigramEncodeExpr(
      GraftSqlBridge.expression(tokens), pieces, maxPieceLen))
}
