package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** TRAINABLE language identification — multiclass hashed Naive Bayes
  * over character trigrams, the learned upgrade of the stopword-marker
  * heuristic (`functions.TextSignals.langid`): the heuristic knows the
  * ~10 languages someone wrote markers for; this fits on ANY labeled
  * seed corpus (CLD/fastText's langid setup is char-n-gram NB/linear —
  * Cavnar & Trenkle 1994's n-gram profiles are the classic citation)
  * and covers whatever the seeds cover — e.g. zh, where a Latin
  * stopword list is structurally blind.
  *
  * Model: per (language, bucket) trigram counts, trigrams drawn from
  * the lowercased whitespace-normalized text and hashed with the same
  * salted-md5 `Sampling.hash32` as every other fitted artifact here —
  * fit and scores are bit-reproducible in any engine. Scoring is the
  * add-one smoothed multinomial NB log-likelihood with the exact
  * integer `bitlen` surrogate (the [[Classifier]]/[[Surprisal]]
  * discipline — one bit of precision per factor, no libm):
  *
  *   score(doc, L) = Σ_g bitlen(c_L(b(g)) + 1) − n_g · bitlen(N_L + B)
  *
  * argmax over L with the deterministic (score DESC, lang ASC)
  * tie-break. Priors deliberately omitted (seed sizes are sampling
  * artifacts, the [[Classifier]] argument).
  *
  * 100 TB shape: the model is ≤ K·B rows and BROADCASTS; the corpus
  * sees one narrow trigram explode, then two keyed aggregates
  * ((doc, lang) partial sums → per-doc argmax as one keyed
  * min(struct(-score, lang)) aggregate with map-side combine) — no
  * corpus-side join ever shuffles the model side, no window sort, and
  * the language list rides a broadcast cross join (K rows). */
object LangId {

  private def norm(text: Column): Column =
    lower(regexp_replace(text, "\\s+", " "))

  private def bitlen(c: Column): Column = length(bin(c)).cast(LongType)

  /** One row per char-trigram occurrence: (keep, __b). Documents with
    * fewer than 3 normalized chars contribute nothing.
    *
    * The normalized text is MATERIALIZED as a column before the
    * per-position transform: a HOF lambda re-evaluates every
    * expression it references PER ELEMENT (no CSE), so referencing
    * `lower(regexp_replace(...))` directly would re-run the regex once
    * per trigram — O(len²) per document (the element_at-in-lambda
    * pitfall on record in SCALE.md). */
  private def grams(df: DataFrame, keep: Seq[Column], textCol: String,
      salt: String, buckets: Int): DataFrame = {
    val base = df.select(keep :+ norm(col(textCol)).as("__nt"): _*)
    // one compiled pass per document (functions.TrigramBuckets —
    // bit-identical to transform(sequence…, i => hash32(substring)),
    // which ran interpreted with one hex-string md5 per element)
    base.select(keep :+ explode(graft.functions.TrigramBuckets
      .trigram_buckets(col("__nt"), salt, buckets)).as("__b"): _*)
  }

  /** Fit on labeled seeds: `(langCol, __b, __c)` hashed trigram counts
    * — ≤ (distinct langs)·buckets rows by construction, the broadcast
    * side of every scoring plan. */
  def fit(seeds: DataFrame, langCol: String, textCol: String,
      buckets: Int = 4096, salt: String = "lid"): DataFrame = {
    require(buckets >= 2, s"need >= 2 buckets, got $buckets")
    grams(seeds, Seq(col(langCol)), textCol, salt, buckets)
      .groupBy(col(langCol), col("__b"))
      .agg(count(lit(1)).as("__c"))
  }

  /** Predict `(idCol, lang_pred, n_grams, best_score)` for every
    * document with >= 1 trigram (the [[Classifier.score]] evidence
    * convention — shorter docs carry no signal; left-join by policy at
    * the call site). */
  def predict(df: DataFrame, model: DataFrame, idCol: String,
      textCol: String, buckets: Int = 4096,
      salt: String = "lid"): DataFrame = {
    require(buckets >= 2, s"need >= 2 buckets, got $buckets")
    val langCol = model.columns.head
    // language totals — K rows, broadcastable by construction
    val totals = model.groupBy(col(langCol))
      .agg(sum(col("__c")).as("__n"))
    val g = grams(df, Seq(col(idCol)), textCol, salt, buckets)
    val ng = g.groupBy(col(idCol)).agg(count(lit(1)).as("n_grams"))
    // matched-evidence partial sums: an unmatched (bucket, lang) pair
    // contributes bitlen(0+1) = 1, folded in as n_grams · 1 below —
    // so the join can stay INNER and model-broadcast
    val matched = g.join(broadcast(model), Seq("__b"))
      .groupBy(col(idCol), col(langCol))
      .agg(sum(bitlen(col("__c") + lit(1L)) - lit(1L)).as("__s"))
    val scored = ng.crossJoin(broadcast(totals))
      .join(matched, Seq(idCol, langCol), "left")
      .withColumn("__score",
        coalesce(col("__s"), lit(0L)) + col("n_grams") -
          col("n_grams") * bitlen(col("__n") + lit(buckets.toLong)))
    // Per-doc argmax as ONE keyed aggregate (map-side partial combine),
    // not a row_number window: the window shuffled AND sorted all K·D
    // candidate rows; min(struct(-score, lang)) reduces each map-side
    // partition to one candidate per doc before the exchange. struct
    // comparison is field-lexicographic and Spark compares strings in
    // UTF-8 binary order — exactly the window's (score DESC, lang ASC)
    // tie-break, bit-for-bit. (score, lang) is unique per doc so the
    // trailing n_grams field never decides.
    scored.groupBy(col(idCol))
      .agg(min(struct((-col("__score")).as("ns"),
        col(langCol).as("l"), col("n_grams").as("g"))).as("__best"))
      .select(col(idCol), col("__best.l").as("lang_pred"),
        col("__best.g").as("n_grams"), (-col("__best.ns")).as("best_score"))
  }

  /** The fitted model as driver-side state for the narrow path:
    * per language (ASC order — the argmax tie-break), the bucket→count
    * map and the class total. Bounded by the fit contract (≤ K·B
    * rows). */
  def modelMaps(model: DataFrame): Seq[(String, Map[Long, Long], Long)] = {
    val langCol = model.columns.head
    val rows = model.collect() // ≤ K·B rows by LangId.fit construction
    // UTF-8 BYTE order, not String.compareTo (UTF-16 code units): the
    // narrow path's strict-improvement fold keeps the EARLIER language
    // on score ties, which matches predict's `col(lang).asc` tie-break
    // only if this sort agrees with Spark's binary UTF8String ordering.
    // The two differ for labels mixing U+E000–U+FFFF with
    // supplementary-plane chars (surrogates sort low in UTF-16, high in
    // UTF-8).
    rows.groupBy(_.getAs[String](langCol)).toSeq
      .sortBy(_._1.getBytes("UTF-8").map(b => (b & 0xff).toChar).mkString)
      .map { case (lang, rs) =>
        val m = rs.iterator
          .map(r => r.getAs[Long]("__b") -> r.getAs[Long]("__c"))
          .filter(_._2 > 0).toMap
        (lang, m, m.valuesIterator.sum)
      }
  }

  /** Zero-shuffle prediction — the [[Classifier.withMarginsNarrow]]
    * discipline: trigram extraction, per-language bitlen scores and
    * the (score DESC, lang ASC) argmax all per ROW, with the hashed
    * models embedded as literal maps. No explode, no exchange,
    * STREAM-SAFE; rows are never dropped — documents without trigram
    * evidence keep NULL n_grams/lang_pred (a stream cannot drop rows
    * by aggregation). Matches [[predict]] bit-for-bit where both
    * exist (LangIdSpec pins it). Literal-map bound: K·B entries ride
    * the expression tree — the [[Classifier]] 65536-entry rule applies
    * per language map. */
  def withLangNarrow(df: DataFrame,
      maps: Seq[(String, Map[Long, Long], Long)], textCol: String,
      buckets: Int = 4096, salt: String = "lid"): DataFrame = {
    require(buckets >= 2, s"need >= 2 buckets, got $buckets")
    require(maps.nonEmpty, "withLangNarrow needs a fitted model")
    require(buckets <= 65536,
      "literal bound: the dense per-language bitlen arrays are " +
        "buckets-sized — above 65536 use LangId.predict's " +
        "broadcast-join path")
    Seq("n_grams", "lang_pred").foreach { c =>
      require(!df.columns.contains(c),
        s"frame already has a '$c' column — rename it first")
    }
    // ONE compiled pass ([[graft.functions.LangScore]]): trigram
    // hashing, the K dense-bitlen sums and the (score DESC, lang ASC)
    // strict-improvement argmax all inside a single native expression —
    // the previous Column formulation (K array literals, one `aggregate`
    // HOF per language) evaluated INTERPRETED, K lambda dispatches per
    // trigram, and a streaming micro-batch re-paid it every batch
    // (~4 s/rep at sf0.1 measured on the stream stage alone). The model
    // rides a codegen reference object, so refits reuse the compiled
    // kernel (the ArgminDist recipe). Null text or no trigram evidence
    // → NULL n_grams/lang_pred, exactly as before.
    // layout-decoupled (guide §2.5) — streaming frames no-op
    val scored = graft.PlanAudit.repartitionIfLayoutBound(df)
      .withColumn("__ls",
      graft.functions.LangScore.lang_score(
        norm(col(textCol)), salt, buckets, maps))
    // two getField references keep CollapseProject from inlining the
    // scorer into consumers (it never duplicates non-cheap exprs), and
    // codegen subexpression elimination evaluates it once
    scored
      .withColumn("n_grams", col("__ls").getField("n_grams"))
      .withColumn("lang_pred", col("__ls").getField("lang_pred"))
      .drop("__ls")
  }
}
