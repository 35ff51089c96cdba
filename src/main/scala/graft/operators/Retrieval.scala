package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Hybrid retrieval: an inverted-index lexical retriever plus
  * reciprocal-rank fusion over any set of per-query rankings.
  *
  * A training-data pipeline that mines "documents like these seeds"
  * (targeted corpus expansion, eval-adjacent mining, RAG index QA) wants
  * BOTH retrieval modalities — lexical term overlap catches exact
  * vocabulary matches that embedding cosine smooths away, and embeddings
  * catch paraphrases with zero term overlap. Rank fusion combines them
  * without any score calibration: reciprocal-rank fusion (Cormack,
  * Clarke & Buettcher, SIGIR 2009) sums `1/(c + rank)` across the input
  * rankings, which is robust to incomparable score scales because it
  * only reads the ranks.
  *
  * Everything is exact-integer so a SQL oracle replays it bit-for-bit:
  * the lexical score is a distinct-term overlap COUNT, and the fusion
  * score is a sum of integer-division contributions
  * `scale div (c + rank)` — no floats anywhere.
  *
  * 100 TB design:
  *   - The lexical retriever never builds an all-pairs product. The
  *     query set's distinct vocabulary broadcasts; the corpus token
  *     table (one explode pass over the corpus) joins against it, so
  *     the shuffled volume is bounded by the corpus postings matching
  *     query terms, not corpus × queries.
  *   - Degenerate stopword terms would make that posting set the whole
  *     corpus, so terms whose document frequency exceeds
  *     `maxDfPermille`/1000 of the corpus are cut (the standard
  *     inverted-index stopword prune); the df aggregate runs only over
  *     the postings already restricted to query vocabulary.
  *   - Fusion is one keyed aggregation over lists × queries × k rows —
  *     output-sized, independent of corpus size — and the final top-k
  *     windows partition by query_id (never a whole-frame window).
  */
object Retrieval {

  /** (id, term) pairs: distinct lowercase whitespace-collapsed tokens.
    * Null/empty text contributes zero rows (explode drops null arrays,
    * matching DuckDB `unnest(NULL)`). */
  private def tokens(df: DataFrame, idCol: String, textCol: String,
      idAs: String): DataFrame =
    df.select(col(idCol).as(idAs),
        explode(array_distinct(split(
          lower(regexp_replace(col(textCol), "\\s+", " ")), " ")))
          .as("__term"))
      .filter(col("__term") =!= "")

  /** Inverted-index lexical top-k: rank corpus documents per query by
    * the number of distinct shared terms (ties broken by id). Returns
    * `(query_id, rank, neighbor_id, overlap)`; a query never retrieves
    * itself. Queries are assumed to be a small seed set (they
    * broadcast). */
  def lexicalOverlapTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, textCol: String, k: Int,
      maxDfPermille: Int = 500): DataFrame = {
    require(k >= 1, s"lexical top-k needs k >= 1, got $k")
    require(maxDfPermille >= 1 && maxDfPermille <= 1000,
      s"maxDfPermille must be in [1, 1000], got $maxDfPermille")
    val cTok = tokens(corpus, idCol, textCol, "__cid")
    val qTok = tokens(queries, idCol, textCol, "query_id")
    // corpus postings restricted to the query vocabulary (broadcast),
    // BEFORE any aggregation — the only full-corpus pass
    val hits = cTok.join(broadcast(qTok.select("__term").distinct()),
      "__term")
    // stopword cut: df computed on the restricted postings is exact for
    // those terms (all docs containing a term survive the restriction);
    // integer permille comparison so an oracle replays it exactly
    val nDocs = corpus.select(count(lit(1)).as("__n"))
    val keep = hits.groupBy("__term").agg(count(lit(1)).as("__df"))
      .crossJoin(broadcast(nDocs))
      .filter(col("__df") * lit(1000L) <= col("__n") * lit(maxDfPermille.toLong))
      .select("__term")
    val scored = hits.join(broadcast(keep), "__term")
      .join(broadcast(qTok), "__term")
      .filter(col("__cid") =!= col("query_id"))
      .groupBy(col("query_id"), col("__cid"))
      .agg(count(lit(1)).as("overlap"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("overlap").desc, col("__cid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"),
        col("__cid").as("neighbor_id"), col("overlap"))
  }

  /** BM25-weighted lexical top-k (Robertson/Spärck Jones; k1=1.2 /
    * b=0.75 Okapi tf normalization) — [[lexicalOverlapTopK]]'s
    * quality-ranked sibling: instead of counting distinct shared terms,
    * each shared term contributes `floor(idf · tfn · 1e9)` and the
    * per-pair score is the exact-integer SUM of the contributions
    * (order-free, so an oracle replays it bit-for-bit; the same
    * fixed-point discipline as the standalone BM25 scorer gate).
    *
    * Documented deviation (the t_bm25 convention): the idf factor is
    * the RAW odds ratio `(N − df + 0.5) / (df + 0.5)` — no logarithm,
    * so a rare term's weight grows ~linearly in N/df instead of
    * logarithmically and rankings can diverge from log-idf BM25 when
    * query terms mix very different rarities. Deliberate: a log is a
    * libm transcendental whose last bits vary by engine, and the whole
    * retrieval surface is pinned to bit-replayable integer oracles;
    * the maxDfPermille stopword cut bounds the head-term end of the
    * same distortion. Swap in an integer log surrogate
    * ([[graft.operators.Surprisal]] `bitlen`) if true BM25 ordering is
    * ever required.
    *
    * Scale shape is identical to the overlap ranker: the query
    * vocabulary broadcasts, corpus postings are restricted to it BEFORE
    * any aggregation (which also makes the df counts exact for those
    * terms), the permille stopword cut bounds posting volume, and the
    * only full-corpus passes are the tokenize and one (sum(dl), n)
    * aggregate for avgdl. Per-query windows only — no corpus×corpus
    * stage. Returns `(query_id, rank, neighbor_id, score_fp)`; a query
    * never retrieves itself. */
  def lexicalBm25TopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, textCol: String, k: Int,
      maxDfPermille: Int = 500): DataFrame = {
    require(k >= 1, s"bm25 top-k needs k >= 1, got $k")
    require(maxDfPermille >= 1 && maxDfPermille <= 1000,
      s"maxDfPermille must be in [1, 1000], got $maxDfPermille")
    val k1 = 1.2
    val b = 0.75
    // NON-distinct tokens with the per-doc length: BM25's tf needs
    // every occurrence, dl the non-empty token count
    val tk = filter(split(
      lower(regexp_replace(col(textCol), "\\s+", " ")), " "),
      t => t =!= "")
    val cTok = corpus.select(col(idCol).as("__cid"), tk.as("__tk"))
      .select(col("__cid"), size(col("__tk")).as("__dl"),
        explode(col("__tk")).as("__term"))
    val qTok = tokens(queries, idCol, textCol, "query_id")
    val hits = cTok.join(broadcast(qTok.select("__term").distinct()),
      "__term")
    val stats = corpus.select(count(lit(1)).as("__n"),
      (sum(when(size(tk) >= 0, size(tk))).cast(DoubleType) /
        count(lit(1))).as("__avgdl"))
    // df on the restricted postings is exact for query terms; the
    // stopword cut is the same integer permille rule as the overlap
    // ranker
    val tf = hits.groupBy(col("__cid"), col("__term"), col("__dl"))
      .agg(count(lit(1)).as("__tf"))
    val df_ = tf.groupBy("__term")
      .agg(count(lit(1)).as("__df")) // one row per (cid, term) already
    val keep = df_.crossJoin(broadcast(stats.select("__n")))
      .filter(col("__df") * lit(1000L) <=
        col("__n") * lit(maxDfPermille.toLong))
      .select("__term", "__df")
    val scored = tf.join(broadcast(keep), "__term")
      .join(broadcast(qTok), "__term")
      .filter(col("__cid") =!= col("query_id"))
      .crossJoin(broadcast(stats))
      .withColumn("__idf",
        (col("__n") - col("__df") + lit(0.5)) / (col("__df") + lit(0.5)))
      .withColumn("__tfn",
        col("__tf") * (lit(k1) + 1) /
          (col("__tf") + lit(k1) *
            (lit(1) - lit(b) + lit(b) * col("__dl") / col("__avgdl"))))
      .withColumn("__term_fp",
        floor(col("__idf") * col("__tfn") * lit(1e9)).cast(LongType))
      .groupBy(col("query_id"), col("__cid"))
      .agg(sum(col("__term_fp")).as("score_fp"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_fp").desc, col("__cid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"),
        col("__cid").as("neighbor_id"), col("score_fp"))
  }

  /** Reciprocal-rank fusion of N rankings. Each input frame must carry
    * `(query_id, rank, neighbor_id)` (extra columns ignored); output is
    * `(query_id, rank, neighbor_id, rrf_fp, n_lists)` with
    * `rrf_fp = Σ_lists scale div (c + rank_in_list)` (integer division,
    * absent-from-list contributes 0) and `n_lists` the number of input
    * rankings that retrieved the neighbor. */
  def rrfFuse(ranks: Seq[DataFrame], k: Int, c: Int = 60,
      scale: Long = 1000000000L): DataFrame = {
    require(ranks.nonEmpty, "rrfFuse needs at least one ranking")
    require(k >= 1, s"rrfFuse needs k >= 1, got $k")
    require(c >= 0, s"rrfFuse needs c >= 0, got $c")
    require(scale >= 1, s"rrfFuse needs scale >= 1, got $scale")
    val contribs = ranks.map(_.select(col("query_id"), col("neighbor_id"),
      expr(s"CAST($scale AS BIGINT) div " +
        s"(CAST($c AS BIGINT) + CAST(rank AS BIGINT))").as("__contrib")))
      .reduce(_.unionByName(_))
    val fused = contribs.groupBy(col("query_id"), col("neighbor_id"))
      .agg(sum(col("__contrib")).as("rrf_fp"),
        count(lit(1)).as("n_lists"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_fp").desc, col("neighbor_id"))
    fused.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        col("rrf_fp"), col("n_lists"))
  }
}
