package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** The whole [[graft.operators.LangId]] narrow scorer as ONE compiled
  * pass: char-trigram hashing ([[TrigramBuckets.eval]] — the exact
  * same bytes), per-language add-one bitlen sums over the dense model
  * arrays, and the (score DESC, lang ASC) strict-improvement argmax.
  *
  * Bit-identical to the Column formulation it replaces (K literal
  * arrays, one interpreted `aggregate` HOF per language): scores are
  * the same integers `Σ_g bitlen(c(b)+1) + n_g − n_g·bitlen(N+B)`,
  * languages are visited in UTF-8 byte order with a strict `<`
  * improvement test, and the no-evidence cases agree — null text or
  * fewer than 3 normalized code points yield NULL n_grams/lang_pred.
  * Why an expression: Catalyst HOFs evaluate INTERPRETED, so the K
  * per-language folds cost K lambda dispatches per trigram (the
  * st_hb_langid stream stage measured ~4 s at sf0.1 on that alone,
  * re-paid every micro-batch); here the K·n_g inner loop is one flat
  * byte-array walk, and the model rides a codegen REFERENCE OBJECT so
  * the generated source is identical across refits (compiled once, the
  * [[ArgminDist]] recipe). Pure narrow map, zero shuffles, stream-safe;
  * driver/executor memory is K·B bytes (the fit contract bounds it).
  */
case class LangScore(child: Expression, model: LangScore.Model)
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = true),
    StructField("lang_pred", StringType, nullable = true)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lang_score needs a string argument, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    LangScore.eval(input.asInstanceOf[UTF8String], model)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("langScoreModel", model,
      classOf[LangScore.Model].getName)
    // `LangScore$.MODULE$`, not the companion-class name: scalac only
    // emits a static forwarder for an object method when the companion
    // class has no member of the same name, and this class inherits
    // eval(InternalRow) from Expression — so `LangScore.eval(str, model)`
    // does not exist as a static method and Janino fails the compile
    // (every caller then pays the interpreted fallback).
    nullSafeCodeGen(ctx, ev, str => {
      s"""
         |${ev.value} = graft.functions.LangScore$$.MODULE$$.eval($str, $mRef);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object LangScore {

  /** Flat model bundle — a single codegen reference object, and the
    * expression's ONLY non-child constructor argument. Deliberately a
    * plain class compared BY REFERENCE: Catalyst walks every
    * constructor arg in equals/hashCode/canonicalize on each plan
    * transform, and the r15 shape (K raw count maps, K·B entries) made
    * every comparison O(K·B) (ADVICE r15). `copy(child = _)` preserves
    * the reference, so transforms stay O(1); two independently built
    * identical models compare unequal — that only forgoes subexpression
    * dedup across separate fits, never correctness. */
  final class Model(val langs: Array[UTF8String], val bitlens: Array[Byte],
      val totBit: Array[Long], val salt: String, val buckets: Int)
    extends Serializable

  private def bitlenL(v: Long): Long =
    64L - java.lang.Long.numberOfLeadingZeros(v)

  /** Flatten the fitted per-language count maps into the dense model:
    * per-language bitlen rows (bitlen(count+1) ≤ 64 fits a byte) and
    * the per-language constant bitlen(total+buckets). */
  def buildModel(salt: String, buckets: Int, langs: Seq[String],
      counts: Seq[Map[Long, Long]], totals: Seq[Long]): Model = {
    require(buckets >= 2, s"need >= 2 buckets, got $buckets")
    require(langs.nonEmpty && langs.length == counts.length &&
      langs.length == totals.length,
      "langs/counts/totals must be non-empty and aligned")
    val k = langs.length
    val flat = new Array[Byte](k * buckets)
    var j = 0
    while (j < k) {
      val m = counts(j)
      var b = 0
      while (b < buckets) {
        flat(j * buckets + b) =
          bitlenL(m.getOrElse(b.toLong, 0L) + 1L).toByte
        b += 1
      }
      j += 1
    }
    new Model(langs.map(UTF8String.fromString).toArray, flat,
      totals.map(t => bitlenL(t + buckets)).toArray, salt, buckets)
  }

  /** The whole-document pass — public because generated code calls it.
    * Returns (n_grams, lang_pred); both NULL when the normalized text
    * has no trigram evidence. */
  def eval(s: UTF8String, m: Model): InternalRow = {
    val gs = TrigramBuckets.eval(s, m.salt, m.buckets)
    val ng = gs.numElements()
    val out = new GenericInternalRow(2)
    if (ng == 0) return out // both fields stay null: no evidence
    val k = m.langs.length
    var best: UTF8String = null
    var bestScore = Long.MinValue
    var j = 0
    while (j < k) {
      val base = j * m.buckets
      var acc = 0L
      var i = 0
      while (i < ng) {
        acc += m.bitlens(base + gs.getLong(i).toInt)
        i += 1
      }
      val sc = acc + ng - ng * m.totBit(j)
      if (bestScore < sc) { bestScore = sc; best = m.langs(j) }
      j += 1
    }
    out.update(0, ng.toLong)
    out.update(1, best)
    out
  }

  /** Column entry point — feed it the NORMALIZED text; languages must
    * arrive in UTF-8 byte order (the argmax tie-break). */
  def lang_score(normText: Column, salt: String, buckets: Int,
      maps: Seq[(String, Map[Long, Long], Long)]): Column =
    GraftSqlBridge.column(LangScore(GraftSqlBridge.expression(normText),
      buildModel(salt, buckets, maps.map(_._1), maps.map(_._2),
        maps.map(_._3))))
}
