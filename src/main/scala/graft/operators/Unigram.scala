package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer (the SentencePiece family: Kudo 2018) — the
  * third tokenizer family next to [[Bpe]] and [[WordPiece]]. Where BPE
  * grows a vocabulary bottom-up by merging and WordPiece scores merges
  * by likelihood, the unigram model starts from a CANDIDATE vocabulary
  * (every substring up to `maxPieceLen`, frequency-ranked) and segments
  * by minimum total piece cost — Viterbi over a unigram language model.
  *
  * Deterministic, engine-portable reconstruction of that recipe:
  *
  *   - costs are INTEGER bit lengths, `cost(p) = bitlen(total) −
  *     bitlen(freq_p)` — the [[Surprisal]] `bitlen` surrogate for
  *     −log₂ p̂ (a true log is a transcendental whose last bits vary by
  *     libm; `length(bin(x))` is exact in Spark AND DuckDB, so every DP
  *     cell replays in a SQL oracle);
  *   - the trainer runs ONE hard-EM (Viterbi-EM) refinement: segment
  *     the distinct words under the candidate costs, recount piece
  *     mass from the segmentation, add-one smooth (every piece
  *     survives — single characters keep full coverage), recost;
  *   - segmentation ties break (cost ASC, piece count ASC, piece
  *     length DESC) per DP cell — a total order, so the segmentation
  *     is partitioning- and engine-stable.
  *
  * 100 TB design: the corpus is touched once per fit phase (the
  * distinct-word frame, Heap's-law-bounded); candidate explosion is
  * O(len·maxPieceLen) substrings per DISTINCT word; the selected
  * vocabulary is bounded (alphabet + topMulti rows) and collects to the
  * driver like every model table (Surprisal/Classifier contract).
  * Encoding is ONE native compiled DP pass per document
  * ([[graft.functions.UnigramEncodeExpr]]) — a zero-shuffle narrow
  * map, stream-safe. */
object Unigram {

  /** One vocabulary entry: the piece, its (possibly smoothed) mass,
    * and its integer bit-length cost. */
  final case class Piece(piece: String, freq: Long, costBits: Int)

  private def bitlen(x: Long): Int =
    64 - java.lang.Long.numberOfLeadingZeros(x) // x >= 1

  private def words(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(Decontaminate.tokens(col(textCol))).as("__w"))
      .filter(length(col("__w")) > 0)
      .groupBy(col("__w")).agg(count(lit(1)).as("__f"))

  /** Candidate fit: every single character plus the `topMulti` most
    * frequent multi-character substrings (length ≤ `maxPieceLen`,
    * every occurrence counted, ties broken piece ASC), with
    * `cost = bitlen(total) − bitlen(freq)` over the selected set. */
  def fit(df: DataFrame, textCol: String, topMulti: Int,
      maxPieceLen: Int = 6): Seq[Piece] = {
    require(topMulti >= 0, s"topMulti must be >= 0, got $topMulti")
    require(maxPieceLen >= 1, s"maxPieceLen must be >= 1, got $maxPieceLen")
    val w = words(df, textCol)
    def substr(s: Column, pos: Column, len: Column): Column =
      call_function("substring", s, pos, len)
    val subs = w.select(col("__f"),
      explode(flatten(transform(sequence(lit(1), length(col("__w"))),
        i => transform(
          sequence(lit(1),
            greatest(least(lit(maxPieceLen),
              length(col("__w")) - i + 1), lit(1))),
          l => substr(col("__w"), i, l))))).as("__p"))
      .groupBy(col("__p")).agg(sum(col("__f")).as("__c"))
    val chars = subs.filter(length(col("__p")) === 1)
      .collect().map(r => (r.getString(0), r.getLong(1))) // alphabet-bounded
    val multi = subs.filter(length(col("__p")) >= 2)
      .orderBy(col("__c").desc, col("__p").asc)
      .limit(topMulti)
      .collect().map(r => (r.getString(0), r.getLong(1))) // ≤ topMulti
    val sel = (chars ++ multi).toSeq
    val total = sel.map(_._2).sum
    sel.map { case (p, f) => Piece(p, f, bitlen(total) - bitlen(f)) }
      .sortBy(_.piece)
  }

  /** One hard-EM (Viterbi-EM) refinement round: segment the distinct
    * words under `pieces`' costs, recount each piece's mass from the
    * segmentation (word-frequency weighted), add-one smooth, recost.
    * Every input piece survives (smoothing), so character coverage
    * holds whatever the segmentation chose. */
  def refit(df: DataFrame, textCol: String,
      pieces: Seq[Piece], maxPieceLen: Int = 6): Seq[Piece] = {
    require(pieces.nonEmpty, "refit needs a non-empty vocabulary")
    val model = pieces.map(p => (p.piece, p.costBits))
    val segCounts = words(df, textCol)
      .select(col("__f"),
        explode(graft.functions.UnigramEncodeExpr.ug_encode(
          array(col("__w")), model, maxPieceLen)).as("__p"))
      .groupBy(col("__p")).agg(sum(col("__f")).as("__c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap // ≤ vocab
    val smoothed = pieces.map(p =>
      (p.piece, segCounts.getOrElse(p.piece, 0L) + 1L))
    val total = smoothed.map(_._2).sum
    smoothed.map { case (p, f) => Piece(p, f, bitlen(total) - bitlen(f)) }
      .sortBy(_.piece)
  }

  /** Candidate fit + one Viterbi-EM refinement — the shipped model. */
  def fitEm(df: DataFrame, textCol: String, topMulti: Int,
      maxPieceLen: Int = 6): Seq[Piece] =
    refit(df, textCol, fit(df, textCol, topMulti, maxPieceLen),
      maxPieceLen)

  /** Per-ROW piece array for a whole text column — one native compiled
    * Viterbi pass ([[graft.functions.UnigramEncodeExpr]]); pure narrow
    * map, zero shuffles, stream-safe. A word with an out-of-alphabet
    * character collapses to `[UNK]`. */
  def encodeCol(text: Column, pieces: Seq[Piece],
      maxPieceLen: Int = 6): Column = {
    require(pieces.nonEmpty, "encodeCol needs a non-empty vocabulary")
    graft.functions.UnigramEncodeExpr.ug_encode(
      Decontaminate.tokens(text),
      pieces.map(p => (p.piece, p.costBits)), maxPieceLen)
  }

  /** The shippable model table: `(piece, freq, cost_bits)` in piece
    * order — reproducible bit-for-bit, the unigram counterpart of
    * [[WordPiece.vocabFrame]]. */
  def modelFrame(spark: org.apache.spark.sql.SparkSession,
      pieces: Seq[Piece]): DataFrame = {
    require(pieces.nonEmpty, "modelFrame needs a non-empty vocabulary")
    import spark.implicits._
    pieces.sortBy(_.piece).map(p => (p.piece, p.freq, p.costBits))
      .toDF("piece", "freq", "cost_bits")
  }
}
