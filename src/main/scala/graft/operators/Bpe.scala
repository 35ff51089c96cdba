package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Deterministic byte-pair-encoding tokenizer training — the missing
  * piece between corpus curation and the training run: learn the merge
  * table ON the corpus the pipeline just built (Sennrich et al., ACL
  * '16), then encode with it.
  *
  * Word-level BPE: the corpus collapses to its DISTINCT words with
  * frequencies (one shuffle of (word, count) pairs — the only time the
  * corpus itself is touched); every word starts as its character
  * sequence plus a `</w>` end marker, and each of the N rounds (a) sums
  * adjacent-symbol-pair frequencies over the vocabulary frame, (b)
  * takes the best pair under the TOTAL order (count DESC, left ASC,
  * right ASC) — one driver row per round, bounded by contract — and
  * (c) rewrites the vocabulary with the merge applied greedily
  * left-to-right (a narrow fold per word; overlapping matches like
  * `a a a` resolve to merge-at-even-offsets within each run of
  * consecutive matches, which IS the left-to-right greedy result).
  *
  * Everything is integer counts and string comparisons — no floats
  * anywhere — so the learned merges are bit-reproducible in any engine
  * and the whole N-round fit replays as unrolled SQL (the gate oracle
  * does exactly that, window functions for the run-parity rule
  * included).
  *
  * 100 TB shape: iterations run on the vocabulary frame (rows = corpus
  * distinct words — Heap's-law bounded, ≪ corpus), persisted per round
  * and exchanged only as (pair, count) partial aggregates; the corpus
  * never re-enters after the initial word count. Encoding is a pure
  * narrow map (per-token fold over the ≤N broadcast-as-literals merge
  * list) — zero shuffles, no model join.
  */
object Bpe {

  final case class Merge(rank: Int, left: String, right: String) {
    def merged: String = left + right
  }

  /** End-of-word marker symbol (never collides with 1-char symbols). */
  val EndOfWord = "</w>"

  /** A word as its initial symbol array: characters, then [[EndOfWord]]. */
  private def charSyms(word: Column): Column =
    concat(
      transform(sequence(lit(1), length(word)),
        i => substring(word, i, lit(1))),
      array(lit(EndOfWord)))

  // substring(Column, Column, Column) has no functions._ overload
  private def substring(str: Column, pos: Column, len: Column): Column =
    call_function("substring", str, pos, len)

  /** One greedy left-to-right merge pass over a symbol array: fold with
    * a carry — `carry==left && x==right` emits the merged symbol and
    * clears the carry (so the right half can't start another match),
    * anything else flushes the carry. Pure narrow expression. */
  def applyMerge(syms: Column, left: String, right: String): Column = {
    val init = struct(
      array().cast("array<string>").as("out"),
      lit(null).cast("string").as("carry"))
    aggregate(syms, init,
      (acc, x) => {
        val out = acc.getField("out")
        val carry = acc.getField("carry")
        when(carry.isNull, struct(out.as("out"), x.as("carry")))
          .when(carry === lit(left) && x === lit(right),
            struct(concat(out, array(lit(left + right))).as("out"),
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

  /** Learn `nMerges` merges from the corpus (fewer if the vocabulary
    * runs out of repeated pairs before that: training stops when the
    * best pair's weighted count drops below `minCount`). */
  def fit(df: DataFrame, textCol: String, nMerges: Int,
      minCount: Long = 2L): Seq[Merge] = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    val words = df
      .select(explode(Decontaminate.tokens(col(textCol))).as("__w"))
      .filter(length(col("__w")) > 0)
      .groupBy(col("__w")).agg(count(lit(1)).as("__f"))
      .select(col("__w"), col("__f"), charSyms(col("__w")).as("__syms"))
    var vocab = words.persist(StorageLevel.MEMORY_AND_DISK)
    val merges = Seq.newBuilder[Merge]
    var rank = 1
    var done = false
    while (rank <= nMerges && !done) {
      val n = size(col("__syms"))
      val best = vocab
        .select(col("__f"), explode(arrays_zip(
          slice(col("__syms"), lit(1), greatest(n - 1, lit(0))).as("__l"),
          slice(col("__syms"), lit(2), greatest(n - 1, lit(0))).as("__r")))
          .as("__p"))
        .groupBy(col("__p.__l").as("__l"), col("__p.__r").as("__r"))
        .agg(sum(col("__f")).as("__c"))
        .orderBy(col("__c").desc, col("__l").asc, col("__r").asc)
        .limit(1).collect() // exactly one row per round — bounded
      best.headOption.filter(_.getLong(2) >= minCount) match {
        case None => done = true
        case Some(row) =>
          val m = Merge(rank, row.getString(0), row.getString(1))
          merges += m
          val next = vocab.select(col("__w"), col("__f"),
            applyMerge(col("__syms"), m.left, m.right).as("__syms"))
            .persist(StorageLevel.MEMORY_AND_DISK)
          next.count() // materialize before dropping the parent
          vocab.unpersist()
          vocab = next
          rank += 1
      }
    }
    vocab.unpersist()
    merges.result()
  }

  /** Encode a text column with a learned merge list: per-token char
    * split, the merges folded in rank order, subword streams joined by
    * spaces. Pure narrow map — the merge table rides in the expression
    * tree, nothing shuffles, nothing joins. (Expression depth grows
    * with the merge count; for vocabularies beyond a few hundred
    * merges, materialize intermediate columns every ~64 folds to keep
    * codegen happy — still narrow.) */
  /** [[encodeCol]] as the native single-pass expression
    * (functions.BpeEncodeExpr) — identical output (BpeSpec pins the
    * parity property), ~10× less work than the interpreted nested-HOF
    * fold. The production encode path; the HOF form remains as the
    * executable semantic specification. */
  def encodeColFast(text: Column, merges: Seq[Merge]): Column =
    graft.functions.BpeEncodeExpr.bpe_encode(text,
      merges.sortBy(_.rank).map(m => (m.left, m.right)))

  def encodeCol(text: Column, merges: Seq[Merge]): Column = {
    val sorted = merges.sortBy(_.rank)
    concat_ws(" ",
      flatten(transform(
        filter(Decontaminate.tokens(text), w => length(w) > 0),
        w => sorted.foldLeft(charSyms(w)) { (syms, m) =>
          applyMerge(syms, m.left, m.right)
        })))
  }

  /** fit + encode on the same frame: adds `encCol` (space-joined
    * subword stream) next to the input columns. `minCount` defaults to
    * 1 here (merge while any pair repeats at all — the SQL-replayable
    * unconditional-N semantic the gates pin); pass 2 for the classic
    * trainer threshold. */
  def fitEncode(df: DataFrame, textCol: String, nMerges: Int,
      encCol: String = "bpe", minCount: Long = 1L): DataFrame =
    df.withColumn(encCol,
      encodeColFast(col(textCol), fit(df, textCol, nMerges, minCount)))
}
