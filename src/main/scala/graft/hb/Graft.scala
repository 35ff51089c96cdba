package graft.hb

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Public API — the gateway/calculator surface collapsed into a library
  * (SURVEY §3.4). A hobbes *configuration* = source + transformation chain
  * + optional merge/join of other configurations' outputs; here those are
  * plain DataFrames in, DataFrame out.
  */
object Graft {

  /** Parse and run a `.hb` program against a source table. */
  def runHb(text: String, source: DataFrame): DataFrame =
    Engine.runHb(text, source)

  def run(program: Ast.Program, source: DataFrame): DataFrame =
    Engine.run(program, source)

  def parse(text: String): Ast.Program = HbParser.parse(text)

  /** `Merge {Datasets}` — union-all by column name, tolerating missing
    * columns on either side; row count is the sum of operands including
    * empty ones (common/hobbes.messaging/src/Broker.fs:81-85;
    * workers/calculator.worker/tests/Processer.fs:63-74). */
  def merge(frames: Seq[DataFrame]): DataFrame =
    frames.reduce(_.unionByName(_, allowMissingColumns = true))

  /** `Join {Left; Right; Field}` — index both sides by `field`, then an
    * outer index join (Deedle's default frame join;
    * workers/calculator.worker/src/Processer.fs:24-33, `right |>
    * left.Join field`; "joins are always done on the index",
    * snippets:60-67). On column-name collision the left side wins —
    * production merge/join configs always join disjoint column sets
    * (tools/workbench/src/Configurations/MergeJoinTest.fs:7-8).
    * AQE / broadcast selection is Spark's: an equi-join on `field`. */
  def join(left: DataFrame, right: DataFrame, field: String): DataFrame = {
    val collisions = right.columns.toSet
      .intersect(left.columns.toSet) - field
    val r = collisions.foldLeft(right)((df, c) => df.drop(c))
    left.join(r, Seq(field), "full_outer")
  }

  // ---- two-frame extension combinators -------------------------------
  // The reference solves two-dataset operations at the CONFIGURATION
  // level: `join`/`merge` providers name other configurations as
  // operands (tools/workbench/src/Types.fs:97-104,182-202) rather than
  // adding statement syntax. These follow the same shape — a second
  // frame bound as the right/eval operand of an extension operator —
  // so `.hb` authors reach them through Configurations sources, and the
  // statement grammar stays single-frame.

  /** Decontaminate provider: every `corpus` row plus a `contaminated`
    * flag (shares a word n-gram with any `evalSet` row). The flag form
    * (not the removal form) so a `.hb` author decides the policy in the
    * chain — `only (! contaminated)` — the way `only` consumes any
    * other column. */
  def decontaminate(corpus: DataFrame, evalSet: DataFrame, idField: String,
      textField: String, n: Int = 8): DataFrame =
    graft.operators.Decontaminate.flag(corpus, evalSet, idField, textField, n)

  /** Semantic decontamination provider: every `corpus` row plus
    * `max_cos_fp` (fixed-point ×1e9 max embedding cosine against any
    * `evalSet` row — the eval side collapses to one broadcast row, the
    * corpus pass is a zero-shuffle narrow map) and `contaminated` at
    * ≥ thresholdFp. Catches paraphrased benchmark leakage the n-gram
    * [[decontaminate]] misses; flag form for the same policy reason. */
  def semanticDecon(corpus: DataFrame, evalSet: DataFrame, idField: String,
      vecField: String, thresholdFp: Long): DataFrame =
    graft.operators.Decontaminate.semanticFlag(corpus, evalSet, idField,
      vecField, thresholdFp)

  /** Fuzzy (near-dup) decontamination provider: every `corpus` row plus
    * a `neardup` flag — verified MinHash Jaccard ≥ threshold against any
    * `reference` row. Catches near-verbatim contamination the exact
    * n-gram form misses; also the incremental-ingest dedup primitive
    * (new batch × already-ingested corpus). Portable hasher: a
    * configuration is a cross-engine artifact, like the `dedup`
    * statements. */
  def nearDups(corpus: DataFrame, reference: DataFrame, idField: String,
      textField: String, threshold: Double = 0.5): DataFrame =
    graft.operators.Dedup.flagNearDupsAgainst(corpus, reference, idField,
      textField, threshold, portable = true)

  /** Cross-corpus scrub provider: every `corpus` row plus `scrubbed` /
    * `n_tokens` / `n_removed` — the exact-substring REMOVAL policy
    * applied against the eval configuration (every token covered by a
    * k-window appearing anywhere in `evalSet` is excised, the rest of
    * the doc survives). The editing counterpart of [[decontaminate]]'s
    * flag: quote-level contamination goes, the document stays. */
  def scrubAgainst(corpus: DataFrame, evalSet: DataFrame, idField: String,
      textField: String, k: Int = 8): DataFrame =
    graft.operators.PassageDedup.scrubAgainst(corpus, idField, textField,
      evalSet, idField, textField, k)

  /** Hybrid-retrieval provider: per-seed top-k corpus rows under
    * reciprocal-rank fusion of the lexical inverted-index ranking and
    * the embedding-cosine ranking (operators.Retrieval +
    * Similarity.bruteForceTopK — each list pools 2k candidates, the
    * fused top-k survives). Seeds are a small frame (both retrievers
    * broadcast them); all scores are exact integers. */
  def retrieve(corpus: DataFrame, seeds: DataFrame, idField: String,
      textField: String, vecField: String, k: Int,
      maxDfPermille: Int = 500): DataFrame = {
    val lex = graft.operators.Retrieval.lexicalOverlapTopK(
      corpus, seeds, idField, textField, 2 * k, maxDfPermille)
    val sem = graft.operators.Similarity.bruteForceTopK(
      corpus.select(idField, vecField), seeds.select(idField, vecField),
      idField, vecField, 2 * k)
    graft.operators.Retrieval.rrfFuse(Seq(lex, sem), k)
  }

  /** As-of provider: backward as-of join (most recent right row at or
    * before each left row's time, per key) of two configurations'
    * outputs. One co-shuffle on the keys — see operators.AsofJoin. */
  def asof(left: DataFrame, right: DataFrame,
      leftTime: String, rightTime: String,
      leftKeys: Seq[String], rightKeys: Seq[String],
      rightVals: Seq[String], prefix: String = "asof_"): DataFrame =
    graft.operators.AsofJoin.backward(left, right, leftTime, rightTime,
      leftKeys, rightKeys, rightVals, prefix)

  /** Range provider: point-in-interval join of two configurations'
    * outputs via the binning decomposition (no nested-loop plan) — see
    * operators.RangeJoin. Bounds are longs (epoch micros, ordinals). */
  def rangeJoin(points: DataFrame, intervals: DataFrame,
      pointField: String, startField: String, endField: String,
      pointKeys: Seq[String], intervalKeys: Seq[String],
      binWidth: Long): DataFrame =
    graft.operators.RangeJoin.binned(points, intervals, pointField,
      startField, endField, pointKeys, intervalKeys, binWidth)

  /** LM-surprisal quality provider: `corpus` rows whose average
    * hashed-bigram surprisal under the `reference` configuration's
    * model is at most `maxAvg1000` milli-bits per bigram
    * (operators.Surprisal — the CCNet filter as a configuration
    * source). Corpus columns survive, plus `avg1000`; documents
    * without bigram evidence drop. */
  def surprisalKeep(corpus: DataFrame, reference: DataFrame,
      idField: String, textField: String, buckets: Int, salt: String,
      maxAvg1000: Long): DataFrame =
    graft.operators.Surprisal.keep(corpus, reference, idField, textField,
      buckets, salt, maxAvg1000)

  /** Hashed-NB classifier provider: `corpus` rows whose per-token
    * log-likelihood margin under the model fitted on `posSeed` vs
    * `negSeed` is at least `minMargin1000` milli-bits
    * (operators.Classifier — the GPT-3/FineWeb "seed classifier"
    * filter as a configuration source). Corpus columns survive, plus
    * `margin1000`; documents without token evidence drop. */
  def classifierKeep(corpus: DataFrame, posSeed: DataFrame,
      negSeed: DataFrame, idField: String, textField: String,
      buckets: Int, salt: String, minMargin1000: Long): DataFrame =
    graft.operators.Classifier.keep(corpus, posSeed, negSeed, idField,
      textField, buckets, salt, minMargin1000)

  /** Drift provider: the top-k rising and falling frequency movers of
    * configuration `b` relative to configuration `a`
    * (operators.Drift.topMovers — snapshot QA as a configuration
    * source). */
  def drift(a: DataFrame, b: DataFrame, textField: String,
      k: Int): DataFrame =
    graft.operators.Drift.topMovers(a, b, textField, k)

  /** Coverage provider: per-stratum OOV report of the corpus
    * configuration under a size-capped vocabulary fitted on the vocab
    * configuration (operators.Vocab.coverage — the tokenizer sanity
    * table as a configuration source). */
  def vocabCoverage(corpus: DataFrame, vocabCorpus: DataFrame,
      stratumField: String, textField: String, size: Int): DataFrame =
    graft.operators.Vocab.coverage(corpus, stratumField, textField,
      graft.operators.Vocab.fit(vocabCorpus, textField, size))

  /** DSIR provider: importance-select the raw configuration toward a
    * target configuration's token distribution — keep the top `pct`% of
    * raw rows by smoothed target-vs-raw unigram likelihood ratio
    * (operators.Dsir; Xie et al. NeurIPS '23). Raw columns survive,
    * plus `score_fp`. */
  def dsirSelect(raw: DataFrame, target: DataFrame, idField: String,
      textField: String, pct: Double, buckets: Int = 0): DataFrame =
    graft.operators.Dsir.select(raw, target, idField, textField, pct,
      buckets)
}
