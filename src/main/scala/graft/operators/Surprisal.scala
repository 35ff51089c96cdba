package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Hashed-bigram language-model quality filter — the CCNet recipe
  * (Wenzek et al., LREC '20: score a corpus by an LM trained on a
  * high-quality reference; keep the low-perplexity slice) with an
  * engine-portable integer surrogate for the log-probability.
  *
  * Model: bigram counts over the reference corpus, hashed into B
  * feature buckets (pair bucket = h(w1 ⧺ ' ' ⧺ w2), context bucket =
  * h(w1)) with the same salted-md5 hash as [[Sampling.hash32]] — so the
  * fitted model and every score are bit-reproducible in ANY engine, not
  * Spark-private. Scoring: each adjacent token pair contributes
  *
  *   surprisal(w1 w2) = max(0, bitlen(cCtx + B) − bitlen(cPair + 1))
  *
  * — an integer floor(−log₂ p̂) surrogate for the add-one-smoothed
  * conditional p̂ = (cPair+1)/(cCtx+B), accurate to within one bit of
  * the real thing. A true log is a transcendental whose last bits vary
  * across libm implementations; `bitlen` (= length of the binary
  * representation) is exact integer arithmetic, so per-doc sums are
  * order-free and a SQL oracle replays the whole filter. The per-doc
  * statistic is avg₁₀₀₀ = (Σ surprisal · 1000) div nPairs — milli-bits
  * per bigram, pure integer division.
  *
  * 100 TB shape: the model is EXACTLY B rows (counts shuffle as
  * (bucket, count) pairs with map-side combine — reference docs never
  * move) and broadcasts for scoring, so the corpus side's only keyed
  * exchange is the per-doc aggregate of (id, partial sums). Same
  * discipline as [[Dsir]]; the two differ in semantics — DSIR ranks by
  * target-vs-raw importance RATIOS, this scores absolute fluency under
  * one reference model — and a real pipeline runs both.
  */
object Surprisal {

  private def bucket(c: Column, salt: String, buckets: Int): Column =
    Sampling.hash32(c, salt) % buckets

  /** Adjacent-pair frame: (idCol, __w1, __w2) per bigram occurrence —
    * a narrow explode of the [[Decontaminate.tokens]] tokenization. */
  private def pairs(df: DataFrame, idCol: String, textCol: String) = {
    val tk = Decontaminate.tokens(col(textCol))
    val n = size(tk)
    df.select(col(idCol),
      explode(arrays_zip(
        slice(tk, lit(1), greatest(n - 1, lit(0))).as("__w1"),
        slice(tk, lit(2), greatest(n - 1, lit(0))).as("__w2"))).as("__p"))
      .select(col(idCol),
        col("__p.__w1").as("__w1"), col("__p.__w2").as("__w2"))
  }

  /** Fit the B-row hashed bigram model on a reference corpus:
    * (__b, __cp, __cc) = per-bucket pair and context counts. Buckets
    * with zero mass are absent (their counts read as 0 at scoring). */
  def fit(ref: DataFrame, textCol: String, buckets: Int,
      salt: String): DataFrame = {
    require(buckets >= 2, s"need >= 2 buckets, got $buckets")
    val p = pairs(ref.select(lit(0L).as("__id"), col(textCol)),
      "__id", textCol)
    val cp = p.groupBy(bucket(concat_ws(" ", col("__w1"), col("__w2")),
        salt, buckets).as("__b"))
      .agg(count(lit(1)).as("__cp"))
    val cc = p.groupBy(bucket(col("__w1"), salt, buckets).as("__b"))
      .agg(count(lit(1)).as("__cc"))
    cp.join(cc, Seq("__b"), "full_outer")
      .select(col("__b"),
        coalesce(col("__cp"), lit(0L)).as("__cp"),
        coalesce(col("__cc"), lit(0L)).as("__cc"))
  }

  /** Score every document with >= 1 bigram: (idCol, n_pairs,
    * surprisal_sum, avg1000). Documents with fewer than two tokens have
    * no bigram evidence and are absent from the output — route them by
    * policy at the call site (a left join on idCol). */
  def score(df: DataFrame, model: DataFrame, idCol: String,
      textCol: String, buckets: Int, salt: String): DataFrame = {
    require(buckets >= 2, s"need >= 2 buckets, got $buckets")
    val p = pairs(df, idCol, textCol)
      .withColumn("__pb", bucket(concat_ws(" ", col("__w1"), col("__w2")),
        salt, buckets))
      .withColumn("__cb", bucket(col("__w1"), salt, buckets))
    val mp = model.select(col("__b").as("__pb"), col("__cp"))
    val mc = model.select(col("__b").as("__cb"), col("__cc"))
    val s = p.join(broadcast(mp), Seq("__pb"), "left")
      .join(broadcast(mc), Seq("__cb"), "left")
      .withColumn("__s", greatest(lit(0L),
        length(bin(coalesce(col("__cc"), lit(0L)) + lit(buckets.toLong)))
          .cast(LongType) -
        length(bin(coalesce(col("__cp"), lit(0L)) + lit(1L)))
          .cast(LongType)))
    s.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_pairs"), sum(col("__s")).as("surprisal_sum"))
      .withColumn("avg1000", expr("(surprisal_sum * 1000) div n_pairs"))
  }

  /** The fitted model as driver-side maps (pair-bucket → count,
    * context-bucket → count) for the narrow scoring path. The collect
    * is bounded by the fit contract: ≤ `buckets` rows, zero-count
    * entries dropped (they read back as 0 via the map miss). */
  def modelMaps(model: DataFrame): (Map[Long, Long], Map[Long, Long]) = {
    val rows = model.collect() // ≤ B rows by Surprisal.fit construction
    (rows.iterator.map(r => r.getLong(0) -> r.getLong(1))
       .filter(_._2 > 0).toMap,
     rows.iterator.map(r => r.getLong(0) -> r.getLong(2))
       .filter(_._2 > 0).toMap)
  }

  /** Zero-shuffle scoring: the same (n_pairs, surprisal_sum, avg1000)
    * statistics as [[score]], computed per ROW by a HOF over the token
    * array with the hashed model embedded as a literal map — no
    * explode, no exchange, so the scorer is STREAM-SAFE (fit offline on
    * the reference corpus, score the live firehose) and, in batch, the
    * whole quality gate stays inside the scan stage. Differences from
    * [[score]], both forced by streaming: rows are never dropped —
    * documents without bigram evidence keep NULL statistics — and the
    * model is a driver map ([[modelMaps]]) instead of a broadcast
    * frame. Values match [[score]] bit-for-bit where both exist
    * (SurprisalSpec).
    *
    * Literal-map bound (the [[Vocab.encodeNarrow]] contract): the ≤2·B
    * model entries ride in the expression tree as `typedlit` maps —
    * right for the hashed-fit contract (B defaults to 4096) and
    * necessary for the stream-stateless pairing, but the literal scales
    * with B, so the path REQUIRES B ≤ 65536; a larger model belongs on
    * [[score]]'s broadcast-join path in batch (the plan keeps a
    * BroadcastHashJoin at any B — SurprisalSpec pins it). */
  def withScoresNarrow(df: DataFrame, mp: Map[Long, Long],
      mc: Map[Long, Long], textCol: String, buckets: Int,
      salt: String): DataFrame = {
    require(buckets >= 2, s"need >= 2 buckets, got $buckets")
    require(buckets <= 65536, s"withScoresNarrow embeds the model as a " +
      s"literal map — bounded at 65536 buckets, got $buckets; use " +
      s"Surprisal.score's broadcast-join path for larger models")
    Seq("n_pairs", "surprisal_sum", "avg1000").foreach { c =>
      require(!df.columns.contains(c),
        s"frame already has a '$c' column — rename it first")
    }
    // ONE compiled pass ([[graft.functions.TokenScores]]): per-bigram
    // hashing and the add-one bitlen score against dense precomputed
    // byte arrays inside a single native expression. The previous
    // Column formulation (slice/arrays_zip + a `transform` HOF)
    // evaluated INTERPRETED — per pair, two md5s through the
    // conv(substring(md5(concat)),16,10) chain plus lambda dispatch —
    // and a streaming micro-batch re-paid it every batch. Scores are
    // the same integers: max(0, bitlen(cc+B) − bitlen(cp+1)) summed,
    // n_pairs = max(n−1, 0), NULL fields without bigram evidence.
    // layout-decoupled (guide §2.5): the compiled scorer is per-row
    // CPU and must not inherit a row-group-capped scan; streaming
    // frames no-op inside the helper
    val scored = graft.PlanAudit.repartitionIfLayoutBound(df)
      .withColumn("__ss",
      graft.functions.TokenScores.bigram_surprisal(
        Decontaminate.tokens(col(textCol)), salt, buckets, mp, mc))
    // two getField references keep CollapseProject from inlining the
    // scorer into consumers (it never duplicates non-cheap exprs)
    scored
      .withColumn("n_pairs", col("__ss").getField("n_pairs"))
      .withColumn("surprisal_sum", col("__ss").getField("surprisal_sum"))
      .drop("__ss")
      .withColumn("avg1000",
        when(col("n_pairs").isNotNull,
          expr("(surprisal_sum * 1000) div n_pairs")))
  }

  /** The filter: fit on `ref`, keep the documents of `df` whose average
    * surprisal is at most `maxAvg1000` milli-bits per bigram. Documents
    * without bigram evidence drop (no fluency signal — the conservative
    * policy for a quality gate). */
  def keep(df: DataFrame, ref: DataFrame, idCol: String, textCol: String,
      buckets: Int, salt: String, maxAvg1000: Long): DataFrame = {
    val sc = score(df, fit(ref, textCol, buckets, salt),
      idCol, textCol, buckets, salt)
    df.join(sc.filter(col("avg1000") <= maxAvg1000)
      .select(col(idCol), col("avg1000")), Seq(idCol))
  }
}
