package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Hashed Naive Bayes quality classifier — the "train a small
  * classifier on labeled seeds, score the whole corpus" curation step
  * (the GPT-3 WebText-vs-CommonCrawl filter and FineWeb-Edu's scorer
  * are this shape), with an engine-portable integer surrogate for the
  * log-likelihood margin.
  *
  * Model: per-class token counts hashed into B feature buckets with the
  * same salted-md5 hash as [[Sampling.hash32]] — fitted model and every
  * score are bit-reproducible in any engine. Scoring uses the add-one
  * smoothed multinomial NB log-likelihood ratio, with each factor's
  * −log₂ replaced by the exact integer `bitlen` surrogate (see
  * [[Surprisal]] — a true log's last bits vary across libm builds):
  *
  *   margin(doc) = Σ_w [bitlen(cPos_w+1) − bitlen(cNeg_w+1)]
  *               + n_tokens · [bitlen(Nneg+B) − bitlen(Npos+B)]
  *
  * ≈ Σ_w log₂ p̂(w|pos) − log₂ p̂(w|neg), accurate to one bit per
  * factor. margin > 0 reads "looks like the positive seed". Class
  * priors are deliberately omitted: curation seeds are samples of two
  * distributions, not a labeled population, so their relative size
  * carries no signal (document-level statement of the CCNet/GPT-3
  * setup). The per-doc statistic is margin1000 = (margin·1000) div
  * n_tokens — milli-bits per token, pure integer division (Spark `div`
  * and DuckDB `//` both truncate toward zero, verified).
  *
  * 100 TB shape: each class model is EXACTLY ≤B rows (token counts
  * shuffle as (bucket, count) pairs with map-side combine — seed
  * documents never move), the joined model broadcasts for scoring, and
  * the only keyed exchange on the corpus side is the per-doc aggregate
  * of (id, partial sums). The class-total constants fold in via a
  * broadcast one-row cross join (same discipline as [[Dsir]]).
  *
  * Reference scope: hobbes has no trainable scorer — its closest shape
  * is `only` over hand-written predicates (`only (lhs) = (rhs)`,
  * /root/reference/tools/hobbes-vscode/.vscode/
  * hobbes-autocomplete.code-snippets:78-81); this is the learned
  * generalization a training-data pipeline needs.
  */
object Classifier {

  private def bucket(c: Column, salt: String, buckets: Int): Column =
    Sampling.hash32(c, salt) % buckets

  /** One row per non-empty token occurrence: (idCol, __w) — the
    * canonical [[Decontaminate.tokens]] tokenization with whitespace
    * artifacts (empty tokens) dropped, so n_tokens counts words. */
  private def toks(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
        explode(Decontaminate.tokens(col(textCol))).as("__w"))
      .filter(length(col("__w")) > 0)

  /** Fit the two-class hashed model: (__b, __cp, __cn) per-bucket
    * positive/negative token counts. Buckets with zero mass in both
    * classes are absent (their counts read as 0 at scoring). */
  def fit(pos: DataFrame, neg: DataFrame, textCol: String,
      buckets: Int, salt: String): DataFrame = {
    require(buckets >= 2, s"need >= 2 buckets, got $buckets")
    def counts(df: DataFrame, as: String) =
      toks(df.select(lit(0L).as("__id"), col(textCol)), "__id", textCol)
        .groupBy(bucket(col("__w"), salt, buckets).as("__b"))
        .agg(count(lit(1)).as(as))
    counts(pos, "__cp").join(counts(neg, "__cn"), Seq("__b"), "full_outer")
      .select(col("__b"),
        coalesce(col("__cp"), lit(0L)).as("__cp"),
        coalesce(col("__cn"), lit(0L)).as("__cn"))
  }

  /** Score every document with >= 1 token: (idCol, n_tokens,
    * margin_sum, margin1000). Empty/whitespace-only documents have no
    * token evidence and are absent — route them by policy at the call
    * site (a left join on idCol). */
  def score(df: DataFrame, model: DataFrame, idCol: String,
      textCol: String, buckets: Int, salt: String): DataFrame = {
    require(buckets >= 2, s"need >= 2 buckets, got $buckets")
    def bitlen(c: Column): Column = length(bin(c)).cast(LongType)
    val totals = model.agg(
      sum(col("__cp")).as("__np"), sum(col("__cn")).as("__nn"))
    val perTok = toks(df, idCol, textCol)
      .withColumn("__b", bucket(col("__w"), salt, buckets))
      .join(broadcast(model), Seq("__b"), "left")
      .withColumn("__m",
        bitlen(coalesce(col("__cp"), lit(0L)) + lit(1L)) -
          bitlen(coalesce(col("__cn"), lit(0L)) + lit(1L)))
    perTok.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum(col("__m")).as("__msum"))
      .crossJoin(broadcast(totals))
      .withColumn("margin_sum",
        col("__msum") + col("n_tokens") *
          (bitlen(col("__nn") + lit(buckets.toLong)) -
            bitlen(col("__np") + lit(buckets.toLong))))
      .withColumn("margin1000", expr("(margin_sum * 1000) div n_tokens"))
      .select(col(idCol), col("n_tokens"), col("margin_sum"),
        col("margin1000"))
  }

  /** The fitted model as driver-side state for the narrow scoring path:
    * (pos map, neg map, pos total, neg total). Bounded by the fit
    * contract (≤ `buckets` rows); zero counts dropped — a map miss
    * reads back as 0. */
  def modelMaps(model: DataFrame): (Map[Long, Long], Map[Long, Long],
      Long, Long) = {
    val rows = model.collect() // ≤ B rows by Classifier.fit construction
    val mp = rows.iterator.map(r => r.getLong(0) -> r.getLong(1))
      .filter(_._2 > 0).toMap
    val mn = rows.iterator.map(r => r.getLong(0) -> r.getLong(2))
      .filter(_._2 > 0).toMap
    (mp, mn, mp.valuesIterator.sum, mn.valuesIterator.sum)
  }

  /** Zero-shuffle scoring: the same (n_tokens, margin_sum, margin1000)
    * statistics as [[score]], computed per ROW by a HOF over the token
    * array with the hashed class models embedded as literal maps — no
    * explode, no exchange, STREAM-SAFE (fit offline on the seeds, score
    * the live firehose). Rows are never dropped: documents without
    * token evidence keep NULL statistics (a stream cannot drop rows by
    * aggregation). Values match [[score]] bit-for-bit where both exist
    * (ClassifierSpec).
    *
    * Literal-map bound (the [[Vocab.encodeNarrow]] contract): the ≤2·B
    * model entries ride in the expression tree as `typedlit` maps —
    * right for the hashed-fit contract (B defaults to 4096) and
    * necessary for the stream-stateless pairing, but the literal scales
    * with B, so the path REQUIRES B ≤ 65536; a larger model belongs on
    * [[score]]'s broadcast-join path in batch (the plan keeps a
    * BroadcastHashJoin at any B — ClassifierSpec pins it). */
  def withMarginsNarrow(df: DataFrame, mp: Map[Long, Long],
      mn: Map[Long, Long], nPos: Long, nNeg: Long, textCol: String,
      buckets: Int, salt: String): DataFrame = {
    require(buckets >= 2, s"need >= 2 buckets, got $buckets")
    require(buckets <= 65536, s"withMarginsNarrow embeds the model as " +
      s"a literal map — bounded at 65536 buckets, got $buckets; use " +
      s"Classifier.score's broadcast-join path for larger models")
    Seq("n_tokens", "margin_sum", "margin1000").foreach { c =>
      require(!df.columns.contains(c),
        s"frame already has a '$c' column — rename it first")
    }
    // ONE compiled pass ([[graft.functions.TokenScores]]): the
    // empty-token filter, per-token hashing and the dense
    // bitlen-difference margin inside a single native expression. The
    // previous Column formulation (`filter` + `transform` + `aggregate`
    // HOFs) evaluated INTERPRETED — per token, one md5 through the
    // conv(substring(md5(concat)),16,10) chain plus three lambda
    // dispatches — and a streaming micro-batch re-paid it every batch.
    // Values identical: margin_sum = Σ (bitlen(p+1)−bitlen(n+1)) +
    // n_tokens·(bitlen(N⁻+B)−bitlen(N⁺+B)), NULL fields without token
    // evidence.
    // layout-decoupled (guide §2.5) — streaming frames no-op
    val scored = graft.PlanAudit.repartitionIfLayoutBound(df)
      .withColumn("__ms",
      graft.functions.TokenScores.nb_margin(
        Decontaminate.tokens(col(textCol)), salt, buckets, mp, mn,
        nPos, nNeg))
    // two getField references keep CollapseProject from inlining the
    // scorer into consumers (it never duplicates non-cheap exprs)
    scored
      .withColumn("n_tokens", col("__ms").getField("n_tokens"))
      .withColumn("margin_sum", col("__ms").getField("margin_sum"))
      .drop("__ms")
      .withColumn("margin1000",
        when(col("n_tokens").isNotNull,
          expr("(margin_sum * 1000) div n_tokens")))
  }

  /** The filter: fit on the seed frames, keep the documents of `df`
    * whose per-token margin is at least `minMargin1000` milli-bits
    * (0 = "closer to the positive seed than the negative"). Documents
    * without token evidence drop — the conservative quality-gate
    * policy, as in [[Surprisal.keep]]. */
  def keep(df: DataFrame, pos: DataFrame, neg: DataFrame, idCol: String,
      textCol: String, buckets: Int, salt: String,
      minMargin1000: Long): DataFrame = {
    val sc = score(df, fit(pos, neg, textCol, buckets, salt),
      idCol, textCol, buckets, salt)
    df.join(sc.filter(col("margin1000") >= minMargin1000)
      .select(col(idCol), col("margin1000")), Seq(idCol))
  }
}
