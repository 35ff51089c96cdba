package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LangId

/** Trainable char-trigram NB language ID: held-out accuracy beats the
  * stopword-marker heuristic (which is structurally blind outside its
  * hand-written marker lists), determinism, and the evidence
  * convention for sub-trigram docs. */
class LangIdSpec extends AnyFunSuite {

  lazy val spark = Sessions.local()
  import spark.implicits._

  // deterministic multilingual corpus: sentence templates per language,
  // varied by index so train/test halves differ
  private val templates = Map(
    "en" -> Seq("the quick brown fox jumps over the lazy dog",
      "this is a sentence about the weather and the sea",
      "children walk to school in the morning light"),
    "de" -> Seq("der schnelle braune fuchs springt über den faulen hund",
      "das wetter ist heute nicht besonders schön gewesen",
      "die kinder gehen morgens über die straße zur schule"),
    "fr" -> Seq("le rapide renard brun saute par dessus le chien",
      "une phrase sur le temps et la mer est écrite",
      "les enfants vont à l'école le matin sous la pluie"),
    "es" -> Seq("el rápido zorro marrón salta sobre el perro perezoso",
      "una frase sobre el tiempo y el mar está escrita",
      "los niños van a la escuela por la mañana temprano"),
    "zh" -> Seq("敏捷的棕色狐狸跳过了懒惰的狗在院子里",
      "今天的天气不是特别好海边风很大",
      "孩子们早上沿着街道步行去学校上课"))

  private def docs(idsFrom: Int, variant: Int) =
    templates.toSeq.sortBy(_._1).zipWithIndex.flatMap {
      case ((lang, ts), li) =>
        ts.indices.map { k =>
          val txt = ts(k) + " " + ts((k + variant) % ts.length)
          (idsFrom + li * 10 + k, lang, txt)
        }
    }.toDF("id", "lang", "text")

  test("held-out prediction: NB >= heuristic accuracy overall, and NB " +
      "names zh where the Latin-marker heuristic cannot") {
    val train = docs(0, 1)
    val test = docs(100, 2)
    val model = LangId.fit(train.select(col("lang"), col("text")),
      "lang", "text", buckets = 4096, salt = "lid")
    val pred = LangId.predict(test, model, "id", "text")
      .join(test.select(col("id"), col("lang")), Seq("id"))
    val rows = pred.collect()
    assert(rows.length == test.count())
    val nbAcc = rows.count(r =>
      r.getAs[String]("lang_pred") == r.getAs[String]("lang"))
    val heur = test.select(col("lang"),
      graft.functions.TextSignals.langid(col("text")).as("p")).collect()
    val heurAcc = heur.count(r => r.getString(0) == r.getString(1))
    assert(nbAcc >= heurAcc,
      s"NB $nbAcc/${rows.length} < heuristic $heurAcc/${rows.length}")
    assert(nbAcc == rows.length,
      s"NB must nail the clean fixture, got $nbAcc/${rows.length}")
    // the zh docs specifically: no Latin stopword fires, so the
    // heuristic falls to its tie-break; NB must name zh
    val zh = rows.filter(_.getAs[String]("lang") == "zh")
    assert(zh.nonEmpty && zh.forall(_.getAs[String]("lang_pred") == "zh"))
  }

  test("narrow literal-map path is bit-identical to the aggregate " +
      "predict where both exist, and keeps NULLs for no-evidence rows") {
    val train = docs(0, 1)
    val test = docs(100, 2).union(
      Seq((999, "xx", "ab")).toDF("id", "lang", "text")) // no trigram
    val model = LangId.fit(train.select(col("lang"), col("text")),
      "lang", "text")
    val agg = LangId.predict(test, model, "id", "text")
      .select(col("id"), col("lang_pred"), col("n_grams"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    val narrow = LangId.withLangNarrow(test,
      LangId.modelMaps(model), "text")
      .select(col("id"), col("lang_pred"), col("n_grams"))
      .collect()
    val narrowDefined = narrow.filter(!_.isNullAt(1))
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(narrowDefined == agg)
    // the stream convention: the no-evidence row survives with NULLs
    val ghost = narrow.filter(_.getInt(0) == 999)
    assert(ghost.length == 1 && ghost.head.isNullAt(1) &&
      ghost.head.isNullAt(2))
  }

  test("native TrigramBuckets is bit-identical to the Catalyst HOF " +
      "formulation (hash32(substring) per position) on adversarial " +
      "strings — unicode, zh, emoji, whitespace runs, empty, null") {
    val texts = Seq("the quick brown fox", "敏捷的棕色狐狸跳过了懒惰的狗",
      "mixé ünïcode ß text", "a\t b\n\nc   d", "ab", "", "🦊x🦊y🦊z",
      null.asInstanceOf[String])
    val df = texts.zipWithIndex.map { case (t, i) => (i, t) }
      .toDF("id", "text")
      .withColumn("nt", lower(regexp_replace(col("text"), "\\s+", " ")))
    val b = 4096
    val hof = df.select(col("id"),
      when(length(col("nt")) >= 3,
        transform(sequence(lit(1), length(col("nt")) - 2),
          i => graft.operators.Sampling.hash32(
            call_function("substring", col("nt"), i, lit(3)), "lid") % b))
        .otherwise(array().cast("array<long>")).as("g"))
      .collect().map(r => r.getInt(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[Long](1))).toMap
    val nat = df.select(col("id"),
      graft.functions.TrigramBuckets.trigram_buckets(col("nt"), "lid", b)
        .as("g"))
      .collect().map(r => r.getInt(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[Long](1))).toMap
    texts.indices.foreach { i =>
      // the HOF wraps null text via when(); both must be null there
      if (texts(i) == null) assert(nat(i) == null)
      else assert(nat(i) == hof(i), s"diverged on '${texts(i)}'")
    }
  }

  test("determinism and the sub-trigram evidence convention") {
    val train = docs(0, 1)
    val model = LangId.fit(train.select(col("lang"), col("text")),
      "lang", "text")
    val tiny = Seq((1, "ab"), (2, "a "), (3, "the sea the sea"))
      .toDF("id", "text")
    val out = LangId.predict(tiny, model, "id", "text")
      .orderBy("id").collect()
    // ids 1 and 2 have no trigram after normalization (len < 3) — absent
    assert(out.map(_.getInt(0)).toSeq == Seq(3))
    assert(out.head.getAs[String]("lang_pred") == "en")
    val again = LangId.predict(tiny, model, "id", "text")
      .orderBy("id").collect()
    assert(out.toSeq == again.toSeq)
  }
}
