package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** WordPiece greedy longest-match encode of a token array — the
  * per-document inner loop of [[graft.operators.WordPiece]] as a native
  * expression: one compiled pass with a hash-set vocabulary, replacing
  * the interpreted Catalyst fold (`aggregate` over positions probing a
  * literal array — measured ~6× slower at sf0.1 before the stream
  * repartition, and still the dominant per-row cost after it).
  *
  * Semantics are IDENTICAL to the fold (WordPieceSpec pins parity, the
  * t_wordpiece oracle pins values): per word, take the longest
  * vocabulary piece at each position (`##`-prefixed off word start,
  * probe lengths capped at the vocabulary's longest piece); a word with
  * an unmatchable remainder collapses to one `[UNK]`. Null/empty
  * tokens contribute nothing; a null token array yields null. */
case class WordPieceEncodeExpr(child: Expression, vocab: Seq[String],
    maxPieceLen: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"wordpiece_encode needs array<string>, got $other")
  }

  private lazy val table: WordPieceEncodeExpr.Vocab =
    new WordPieceEncodeExpr.Vocab(vocab.toArray, maxPieceLen)

  override def nullSafeEval(input: Any): Any =
    WordPieceEncodeExpr.encodeTokens(input.asInstanceOf[ArrayData], table)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val tbl = ctx.addReferenceObj("wpVocab", table,
      classOf[WordPieceEncodeExpr.Vocab].getName)
    nullSafeCodeGen(ctx, ev, arr => {
      s"""
         |${ev.value} =
         |  graft.functions.WordPieceEncodeExpr.encodeTokens($arr, $tbl);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object WordPieceEncodeExpr {

  val Unk = "[UNK]"

  /** Compiled vocabulary: hash-set membership, the effective probe cap
    * (no piece is longer than the longest member), and the vocabFrame
    * id layout ([UNK]=0, sorted pieces at 1..N). */
  final class Vocab(pieces: Array[String], maxPieceLen: Int)
      extends Serializable {
    val set: java.util.HashSet[String] = {
      val s = new java.util.HashSet[String](pieces.length * 2)
      pieces.foreach(s.add)
      s
    }
    // lengths in CODE POINTS, not UTF-16 units: the Catalyst spec fold
    // probes with Spark substring/length (code-point semantics), so a
    // UTF-16 cap would undercount non-BMP pieces and miss matches the
    // spec makes (a 2-code-point piece is 4 UTF-16 units)
    val maxLen: Int = math.min(maxPieceLen,
      pieces.iterator.map { p =>
        val body = if (p.startsWith("##")) p.substring(2) else p
        body.codePointCount(0, body.length)
      }.foldLeft(1)(math.max))
    val ids: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer](pieces.length * 2)
      m.put(Unk, 0)
      pieces.distinct.sorted.zipWithIndex.foreach { case (p, i) =>
        if (!m.containsKey(p)) m.put(p, i + 1)
      }
      m
    }
  }

  /** Greedy-encode every non-empty token of `tokens`, flattened. */
  def encodeTokens(tokens: ArrayData, v: Vocab): ArrayData = {
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String](
      tokens.numElements() * 2)
    var i = 0
    val n = tokens.numElements()
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val w = tokens.getUTF8String(i).toString
        if (w.nonEmpty) encodeWordInto(w, v, out)
      }
      i += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  /** [[encodeTokens]] with each piece mapped to its vocabFrame id. */
  def encodeTokenIds(tokens: ArrayData, v: Vocab): ArrayData = {
    val pieces = encodeTokens(tokens, v)
    val n = pieces.numElements()
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      out(i) = v.ids.get(pieces.getUTF8String(i).toString).intValue()
      i += 1
    }
    new GenericArrayData(out)
  }

  private def encodeWordInto(word: String, v: Vocab,
      out: scala.collection.mutable.ArrayBuffer[UTF8String]): Unit = {
    val u16 = word.length
    // the walk is in CODE POINTS (Spark substring semantics — the spec
    // fold's units); bounds(k) = UTF-16 offset of code point k. BMP
    // words (the common case) skip the boundary table entirely.
    val ncp = word.codePointCount(0, u16)
    val bounds: Array[Int] =
      if (ncp == u16) null
      else {
        val b = new Array[Int](ncp + 1)
        var o = 0
        var k = 0
        while (k < ncp) { b(k) = o; o = word.offsetByCodePoints(o, 1); k += 1 }
        b(ncp) = u16
        b
      }
    @inline def off(k: Int): Int = if (bounds == null) k else bounds(k)
    val tmp = new scala.collection.mutable.ArrayBuffer[UTF8String](4)
    var p = 0
    while (p < ncp) {
      var l = math.min(v.maxLen, ncp - p)
      var hit: String = null
      while (l >= 1 && hit == null) {
        val raw = word.substring(off(p), off(p + l))
        val cand = if (p == 0) raw else "##" + raw
        if (v.set.contains(cand)) hit = cand else l -= 1
      }
      if (hit == null) { // unmatchable remainder → the whole word is UNK
        out += UTF8String.fromString(Unk)
        return
      }
      tmp += UTF8String.fromString(hit)
      p += l
    }
    out ++= tmp
  }

  /** Column-level entry point over a token array. */
  def wp_encode(tokens: Column, vocab: Seq[String],
      maxPieceLen: Int): Column =
    GraftSqlBridge.column(WordPieceEncodeExpr(
      GraftSqlBridge.expression(tokens), vocab, maxPieceLen))

  /** Column-level entry point for the id form. */
  def wp_encode_ids(tokens: Column, vocab: Seq[String],
      maxPieceLen: Int): Column =
    GraftSqlBridge.column(WordPieceIdsExpr(
      GraftSqlBridge.expression(tokens), vocab, maxPieceLen))
}

/** The id form of [[WordPieceEncodeExpr]]: the same greedy walk, each
  * piece mapped to its [[graft.operators.WordPiece.vocabFrame]] id
  * (`[UNK]` = 0, sorted vocabulary at 1..N) — the BERT `input_ids`
  * artifact column. Piece↔id layout is the vocabFrame contract, so the
  * t_wordpiece_vocab table decodes exactly what this emits. */
case class WordPieceIdsExpr(child: Expression, vocab: Seq[String],
    maxPieceLen: Int) extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"wordpiece_encode_ids needs array<string>, got $other")
  }

  private lazy val table: WordPieceEncodeExpr.Vocab =
    new WordPieceEncodeExpr.Vocab(vocab.toArray, maxPieceLen)

  override def nullSafeEval(input: Any): Any =
    WordPieceEncodeExpr.encodeTokenIds(
      input.asInstanceOf[ArrayData], table)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val tbl = ctx.addReferenceObj("wpVocab", table,
      classOf[WordPieceEncodeExpr.Vocab].getName)
    nullSafeCodeGen(ctx, ev, arr => {
      s"""
         |${ev.value} =
         |  graft.functions.WordPieceEncodeExpr.encodeTokenIds($arr, $tbl);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}
