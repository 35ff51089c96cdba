package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WordPiece tokenizer (the BERT family: Schuster & Nakajima 2012; Wu
  * et al. 2016 §4.1) — the second production tokenizer family next to
  * [[Bpe]]. Same merge-table machinery, two deliberate differences:
  *
  *   - TRAINING ranks candidate pairs by the likelihood ratio
  *     `count(l,r) / (count(l)·count(r))` instead of raw pair count —
  *     a pair merges when its parts co-occur more than chance, so rare
  *     but exclusive pairs beat frequent-by-accident ones. Scores are
  *     fixed-point integers (`c_pair·1e6 div (c_l·c_r)`) under the
  *     total order (score DESC, pair count DESC, left ASC, right ASC),
  *     so a SQL oracle replays every round bit-for-bit.
  *   - ENCODING is greedy longest-match-first against the final
  *     vocabulary (not merge replay): at each position take the
  *     longest vocabulary piece, `##`-prefixed off word start; a word
  *     with an unmatchable remainder encodes as one `[UNK]`.
  *
  * Symbols follow the BERT convention: the word-initial piece is bare,
  * every continuation piece carries the `##` prefix ("cat" →
  * `c ##a ##t`; merging (`c`,`##a`) yields `ca`).
  *
  * 100 TB design: the corpus is touched ONCE (the word-count frame —
  * Heap's-law-bounded distinct words); each training round is two
  * bounded aggregates (pair counts + unit counts) and one driver row.
  * Encoding is ONE native compiled pass per document
  * ([[graft.functions.WordPieceEncodeExpr]] — hash-set membership, the
  * BpeEncodeExpr recipe): a pure narrow map, zero shuffles,
  * vocabulary-size-independent probes, stream-safe. The Column-fold
  * form ([[encodeWord]]) stays as the executable specification the
  * parity test pins the native pass against.
  */
object WordPiece {

  final case class Merge(rank: Int, left: String, right: String,
      scoreFp: Long) {
    /** BERT join rule: the right part drops its continuation marker. */
    def merged: String = left + right.stripPrefix("##")
  }

  val Unk = "[UNK]"
  private val ScoreScale = 1000000L

  // substring(Column, Column, Column) has no functions._ overload
  private def substring(str: Column, pos: Column, len: Column): Column =
    call_function("substring", str, pos, len)

  /** A word as WordPiece symbols: first char bare, rest `##`-prefixed. */
  private def pieceSyms(word: Column): Column =
    transform(sequence(lit(1), length(word)),
      i => when(i === 1, substring(word, i, lit(1)))
        .otherwise(concat(lit("##"), substring(word, i, lit(1)))))

  /** Distinct lowercase whitespace words with frequencies and initial
    * symbol spellings — the only corpus pass of the trainer. */
  private def wordFrame(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(Decontaminate.tokens(col(textCol))).as("__w"))
      .filter(length(col("__w")) > 0)
      .groupBy(col("__w")).agg(count(lit(1)).as("__f"))
      .select(col("__w"), col("__f"), pieceSyms(col("__w")).as("__syms"))

  /** One greedy left-to-right merge pass emitting `merged` for each
    * non-overlapping adjacent (left, right) — [[Bpe.applyMerge]]'s
    * carry fold with the WordPiece join rule. */
  private def applyMergeAs(syms: Column, left: String, right: String,
      merged: String): Column = {
    val init = struct(
      array().cast("array<string>").as("out"),
      lit(null).cast("string").as("carry"))
    aggregate(syms, init,
      (acc, x) => {
        val out = acc.getField("out")
        val carry = acc.getField("carry")
        when(carry.isNull, struct(out.as("out"), x.as("carry")))
          .when(carry === lit(left) && x === lit(right),
            struct(concat(out, array(lit(merged))).as("out"),
              lit(null).cast("string").as("carry")))
          .otherwise(struct(concat(out, array(carry)).as("out"),
            x.as("carry")))
      },
      acc => {
        val out = acc.getField("out")
        val carry = acc.getField("carry")
        when(carry.isNull, out).otherwise(concat(out, array(carry)))
      })
  }

  /** Train `nMerges` likelihood-ranked merges. Each round: pair counts
    * and unit counts (two bounded aggregates with map-side combine),
    * one `limit(1).collect()` driver row, one narrow merge pass with
    * lineage truncated per round (the [[Bpe.fit]] localCheckpoint
    * discipline). Stops early when no pair reaches `minCount`. */
  def fit(df: DataFrame, textCol: String, nMerges: Int,
      minCount: Long = 2L): Seq[Merge] = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    require(minCount >= 1L, s"minCount must be >= 1, got $minCount")
    var vocab = wordFrame(df, textCol).localCheckpoint(true)
    val merges = Seq.newBuilder[Merge]
    var rank = 1
    var done = false
    while (rank <= nMerges && !done) {
      val n = size(col("__syms"))
      val pairs = vocab
        .select(col("__f"), explode(arrays_zip(
          slice(col("__syms"), lit(1), greatest(n - 1, lit(0))).as("__l"),
          slice(col("__syms"), lit(2), greatest(n - 1, lit(0))).as("__r")))
          .as("__p"))
        .groupBy(col("__p.__l").as("__l"), col("__p.__r").as("__r"))
        .agg(sum(col("__f")).as("__c"))
      val units = vocab
        .select(col("__f"), explode(col("__syms")).as("__u"))
        .groupBy(col("__u")).agg(sum(col("__f")).as("__uc"))
      val best = pairs
        .join(units.select(col("__u").as("__l"), col("__uc").as("__lc")),
          "__l")
        .join(units.select(col("__u").as("__r"), col("__uc").as("__rc")),
          "__r")
        .select(col("__l"), col("__r"), col("__c"),
          expr(s"(__c * $ScoreScale) div (__lc * __rc)").as("__s"))
        .orderBy(col("__s").desc, col("__c").desc, col("__l").asc,
          col("__r").asc)
        .limit(1).collect() // exactly one row per round — bounded
      best.headOption.filter(_.getAs[Long]("__c") >= minCount) match {
        case None => done = true
        case Some(row) =>
          val m = Merge(rank, row.getAs[String]("__l"),
            row.getAs[String]("__r"), row.getAs[Long]("__s"))
          merges += m
          vocab = vocab.select(col("__w"), col("__f"),
            applyMergeAs(col("__syms"), m.left, m.right, m.merged)
              .as("__syms"))
            .localCheckpoint(true)
          rank += 1
      }
    }
    merges.result()
  }

  /** The final vocabulary for [[fit]]'s merges over `df`: every
    * word-initial and `##`-continuation character of the corpus plus
    * each merge's joined piece. */
  def vocabulary(df: DataFrame, textCol: String,
      merges: Seq[Merge]): Seq[String] = {
    val chars = wordFrame(df, textCol)
      .select(explode(col("__syms")).as("__u"))
      .distinct().collect().map(_.getString(0)) // alphabet-bounded
    (chars.toSeq ++ merges.map(_.merged)).distinct.sorted
  }

  /** The shippable vocab.txt-equivalent table: `(id, piece)` with
    * `[UNK]` at id 0 and the vocabulary in its deterministic sorted
    * order after it — engine- and partitioning-stable, so the artifact
    * a downstream tokenizer loads is reproducible bit-for-bit. */
  def vocabFrame(spark: org.apache.spark.sql.SparkSession,
      vocab: Seq[String]): DataFrame = {
    require(vocab.nonEmpty, "vocabFrame needs a non-empty vocabulary")
    import spark.implicits._
    ((0, Unk) +: vocab.distinct.sorted.zipWithIndex
      .map { case (p, i) => (i + 1, p) }).toDF("id", "piece")
  }

  /** Greedy longest-match piece array for one word column against a
    * literal vocabulary. Word-initial pieces match bare, continuations
    * `##`-prefixed; an unmatchable remainder collapses the word to one
    * `[UNK]`. Pure narrow expression (the per-position candidate probe
    * walks lengths `maxPieceLen..1`). */
  def encodeWord(word: Column, vocab: Seq[String],
      maxPieceLen: Int = 16): Column = {
    require(vocab.nonEmpty, "encodeWord needs a non-empty vocabulary")
    require(maxPieceLen >= 1, s"maxPieceLen must be >= 1, got $maxPieceLen")
    val vocabLit = array(vocab.map(lit): _*)
    // no vocabulary piece is longer than its longest member — probing
    // lengths beyond that is pure wasted membership checks (the fold is
    // interpreted, so the constant matters)
    val effMax = math.min(maxPieceLen,
      vocab.map(p => if (p.startsWith("##")) p.length - 2 else p.length)
        .max.max(1))
    val len = length(word)
    val init = struct(lit(1).as("p"),
      array().cast("array<string>").as("toks"), lit(false).as("bad"))
    val folded = aggregate(sequence(lit(1), greatest(len, lit(1))), init,
      (st, _) => {
        val p = st.getField("p")
        val stDone = st.getField("bad") || p > len
        val hi = least(lit(effMax), len - p + 1)
        val cand = (l: Column) =>
          when(p === 1, substring(word, p, l))
            .otherwise(concat(lit("##"), substring(word, p, l)))
        val matched = filter(sequence(hi, lit(1), lit(-1)),
          l => array_contains(vocabLit, cand(l)))
        val l0 = element_at(matched, 1)
        when(stDone, st)
          .when(size(matched) === 0,
            struct(p.as("p"), st.getField("toks").as("toks"),
              lit(true).as("bad")))
          .otherwise(struct((p + l0).as("p"),
            concat(st.getField("toks"), array(cand(l0))).as("toks"),
            lit(false).as("bad")))
      },
      st => when(st.getField("bad"), array(lit(Unk)))
        .otherwise(st.getField("toks")))
    when(len > 0, folded).otherwise(array().cast("array<string>"))
  }

  /** Per-ROW piece array for a whole text column — ONE native compiled
    * pass ([[graft.functions.WordPieceEncodeExpr]]: hash-set vocabulary,
    * greedy longest-match, `[UNK]` collapse; parity with the
    * [[encodeWord]] fold pinned in WordPieceSpec). A pure narrow map:
    * zero shuffles at any scale, stream-safe. */
  def encodeCol(text: Column, vocab: Seq[String],
      maxPieceLen: Int = 16): Column = {
    require(vocab.nonEmpty, "encodeCol needs a non-empty vocabulary")
    require(maxPieceLen >= 1, s"maxPieceLen must be >= 1, got $maxPieceLen")
    graft.functions.WordPieceEncodeExpr.wp_encode(
      Decontaminate.tokens(text), vocab, maxPieceLen)
  }

  /** The BERT `input_ids` form: the same greedy walk with each piece
    * mapped to its [[vocabFrame]] id (`[UNK]` = 0, sorted vocabulary at
    * 1..N) — the shippable training-artifact column; the
    * t_wordpiece_vocab table is its exact decoder. Pure narrow map. */
  def encodeIdsCol(text: Column, vocab: Seq[String],
      maxPieceLen: Int = 16): Column = {
    require(vocab.nonEmpty, "encodeIdsCol needs a non-empty vocabulary")
    require(maxPieceLen >= 1, s"maxPieceLen must be >= 1, got $maxPieceLen")
    graft.functions.WordPieceEncodeExpr.wp_encode_ids(
      Decontaminate.tokens(text), vocab, maxPieceLen)
  }

  /** Encode every document: lowercase whitespace words, each replaced
    * by its piece sequence — one narrow [[encodeCol]] pass, zero
    * shuffles (the encode is context-free per word and the inner loop
    * is compiled, so there is nothing to memoize or join). Returns
    * `(idCol, wp, n_pieces)` with `wp` the space-joined piece stream;
    * a doc with no words gets `wp = '' / n_pieces = 0`, null text stays
    * null. */
  def encode(df: DataFrame, idCol: String, textCol: String,
      vocab: Seq[String], maxPieceLen: Int = 16): DataFrame =
    df.select(col(idCol),
        encodeCol(col(textCol), vocab, maxPieceLen).as("__wps"))
      .select(col(idCol),
        array_join(col("__wps"), " ").as("wp"),
        when(col("__wps").isNotNull, size(col("__wps")).cast("long"))
          .as("n_pieces"))
}
