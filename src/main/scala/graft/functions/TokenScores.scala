package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass token scorers for the hashed-model narrow paths —
  * [[graft.operators.Surprisal.withScoresNarrow]] and
  * [[graft.operators.Classifier.withMarginsNarrow]] hot loops.
  *
  * Both replace a Catalyst `transform`+`aggregate` HOF chain that
  * evaluated INTERPRETED: per element, one lambda dispatch plus the
  * `conv(substring(md5(concat(w, ':', salt)), 1, 8), 16, 10)` hashing
  * chain (UTF8String concat, hex render, hex parse) — the dominant cost
  * of the streaming scorer gates, re-paid every micro-batch. Here each
  * token hashes once in a compiled JVM loop (one reused MessageDigest,
  * first 4 digest bytes as the unsigned 32-bit value — byte-identical
  * to the `Sampling.hash32` recipe, the [[TrigramBuckets]] precedent)
  * and the per-bucket scores come from dense precomputed byte arrays
  * riding a codegen REFERENCE OBJECT (generated source identical across
  * refits — compiled once, the [[ArgminDist]] recipe).
  *
  * Tokenization stays in Catalyst (`Decontaminate.tokens` feeds the
  * child): split/lower/regex semantics are engine-subtle, so oracle
  * parity is kept by sharing the builtins. Pure narrow maps, zero
  * shuffles, stream-safe.
  */
object TokenScores {

  private val md5Local =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  /** `Sampling.hash32(s, salt) % buckets` over raw UTF-8 bytes. */
  private def bucketOf(md: java.security.MessageDigest, a: Array[Byte],
      mid: Array[Byte], b: Array[Byte], saltBytes: Array[Byte],
      buckets: Int): Int = {
    md.reset()
    md.update(a)
    if (mid != null) md.update(mid)
    if (b != null) md.update(b)
    md.update(saltBytes)
    val d = md.digest()
    val h = ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
      ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
    (h % buckets).toInt
  }

  private val SP = Array[Byte](' ')

  /** Null token elements are SKIPPED, not thrown on: the canonical
    * feeder (`Decontaminate.tokens` — a split) never yields nulls, but
    * the replaced HOF formulation null-propagated gracefully and these
    * kernels must not be more brittle than what they replaced (ADVICE
    * r15). Skipping treats the non-null tokens as the token stream —
    * identical to pre-filtering nulls before the call. */
  private def tokenBytes(arr: ArrayData, i: Int): Array[Byte] =
    arr.getUTF8String(i).getBytes

  /** Per-bucket bigram-surprisal model: precomputed bitlen terms. */
  final class SurprisalModel(val cpBit: Array[Byte], val ccBit: Array[Byte],
      val saltBytes: Array[Byte], val buckets: Int) extends Serializable

  /** The whole-document bigram pass — public for generated code.
    * Returns (n_pairs, surprisal_sum); both NULL when the token array
    * holds fewer than 2 tokens (no bigram evidence). */
  def evalSurprisal(arr: ArrayData, m: SurprisalModel): InternalRow = {
    val n = arr.numElements()
    val out = new GenericInternalRow(2)
    val md = md5Local.get()
    var sum = 0L
    var pairs = 0L
    var w1: Array[Byte] = null
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val w2 = tokenBytes(arr, i)
        if (w1 != null) {
          val cp = m.cpBit(bucketOf(md, w1, SP, w2, m.saltBytes, m.buckets))
          val cc = m.ccBit(bucketOf(md, w1, null, null, m.saltBytes,
            m.buckets))
          val s = (cc - cp).toLong
          if (s > 0L) sum += s
          pairs += 1L
        }
        w1 = w2
      }
      i += 1
    }
    if (pairs == 0L) return out // no bigram evidence: both fields null
    out.update(0, pairs)
    out.update(1, sum)
    out
  }

  /** Per-bucket NB-margin model: precomputed bitlen differences plus
    * the per-token class-total constant. */
  final class MarginModel(val margin: Array[Byte], val constTerm: Long,
      val saltBytes: Array[Byte], val buckets: Int) extends Serializable

  /** The whole-document unigram pass — public for generated code.
    * Empty tokens are skipped (the `filter(length > 0)` contract);
    * returns (n_tokens, margin_sum), both NULL without token
    * evidence. */
  def evalMargin(arr: ArrayData, m: MarginModel): InternalRow = {
    val n = arr.numElements()
    val md = md5Local.get()
    var np = 0L
    var sum = 0L
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val w = tokenBytes(arr, i)
        if (w.length > 0) {
          np += 1L
          sum += m.margin(bucketOf(md, w, null, null, m.saltBytes,
            m.buckets))
        }
      }
      i += 1
    }
    val out = new GenericInternalRow(2)
    if (np == 0L) return out // no evidence: both fields stay null
    out.update(0, np)
    out.update(1, sum + np * m.constTerm)
    out
  }

  private def bitlenL(v: Long): Long =
    64L - java.lang.Long.numberOfLeadingZeros(v)

  private abstract class TokenScoreExpr extends UnaryExpression {
    def fields: (String, String)
    override def dataType: DataType = StructType(Seq(
      StructField(fields._1, LongType, nullable = true),
      StructField(fields._2, LongType, nullable = true)))
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"token scorer needs an array<string> argument, got $other")
      }
  }

  /** (n_pairs, surprisal_sum) over a token array — the
    * [[graft.operators.Surprisal]] narrow scorer kernel. */
  private case class BigramSurprisal(child: Expression, salt: String,
      buckets: Int, pairCounts: Map[Long, Long], ctxCounts: Map[Long, Long])
      extends TokenScoreExpr {
    override def fields: (String, String) = ("n_pairs", "surprisal_sum")
    @transient private lazy val model: SurprisalModel = {
      // score(pair) = max(0, bitlen(cc + B) − bitlen(cp + 1)): both
      // terms depend only on the bucket, so precompute them (≤ 64
      // each — bytes)
      val cp = Array.tabulate(buckets)(b =>
        bitlenL(pairCounts.getOrElse(b.toLong, 0L) + 1L).toByte)
      val cc = Array.tabulate(buckets)(b =>
        bitlenL(ctxCounts.getOrElse(b.toLong, 0L) + buckets).toByte)
      new SurprisalModel(cp, cc, (":" + salt).getBytes("UTF-8"), buckets)
    }
    override def nullSafeEval(input: Any): Any =
      evalSurprisal(input.asInstanceOf[ArrayData], model)
    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode = {
      val mRef = ctx.addReferenceObj("surprisalModel", model,
        classOf[SurprisalModel].getName)
      nullSafeCodeGen(ctx, ev, arr => {
        s"""
           |${ev.value} =
           |  graft.functions.TokenScores.evalSurprisal($arr, $mRef);
         """.stripMargin
      })
    }
    override protected def withNewChildInternal(newChild: Expression)
        : Expression = copy(child = newChild)
  }

  /** (n_tokens, margin_sum) over a token array — the
    * [[graft.operators.Classifier]] narrow scorer kernel. */
  private case class NbMargin(child: Expression, salt: String,
      buckets: Int, posCounts: Map[Long, Long], negCounts: Map[Long, Long],
      nPos: Long, nNeg: Long) extends TokenScoreExpr {
    override def fields: (String, String) = ("n_tokens", "margin_sum")
    @transient private lazy val model: MarginModel = {
      val m = Array.tabulate(buckets)(b =>
        (bitlenL(posCounts.getOrElse(b.toLong, 0L) + 1L) -
          bitlenL(negCounts.getOrElse(b.toLong, 0L) + 1L)).toByte)
      new MarginModel(m,
        bitlenL(nNeg + buckets) - bitlenL(nPos + buckets),
        (":" + salt).getBytes("UTF-8"), buckets)
    }
    override def nullSafeEval(input: Any): Any =
      evalMargin(input.asInstanceOf[ArrayData], model)
    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode = {
      val mRef = ctx.addReferenceObj("marginModel", model,
        classOf[MarginModel].getName)
      nullSafeCodeGen(ctx, ev, arr => {
        s"""
           |${ev.value} =
           |  graft.functions.TokenScores.evalMargin($arr, $mRef);
         """.stripMargin
      })
    }
    override protected def withNewChildInternal(newChild: Expression)
        : Expression = copy(child = newChild)
  }

  /** Column entry point — feed it the `Decontaminate.tokens` array. */
  def bigram_surprisal(tokens: Column, salt: String, buckets: Int,
      pairCounts: Map[Long, Long], ctxCounts: Map[Long, Long]): Column =
    GraftSqlBridge.column(BigramSurprisal(
      GraftSqlBridge.expression(tokens), salt, buckets, pairCounts,
      ctxCounts))

  /** Column entry point — feed it the `Decontaminate.tokens` array. */
  def nb_margin(tokens: Column, salt: String, buckets: Int,
      posCounts: Map[Long, Long], negCounts: Map[Long, Long],
      nPos: Long, nNeg: Long): Column =
    GraftSqlBridge.column(NbMargin(GraftSqlBridge.expression(tokens),
      salt, buckets, posCounts, negCounts, nPos, nNeg))
}
