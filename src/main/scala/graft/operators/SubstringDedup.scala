package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT repeated-substring deduplication at ARBITRARY length
  * (Lee et al. 2022, "Deduplicating Training Data Makes Language Models
  * Better", the EXACTSUBSTR objective): find — and optionally excise —
  * every token position covered by a substring of length ≥ k that
  * occurs verbatim MORE THAN ONCE anywhere in the corpus (same or
  * different document).
  *
  * The whole problem reduces EXACTLY to k-token windows: a position
  * lies inside a duplicated substring of length ≥ k IFF one of the
  * k-windows covering it is duplicated, and a maximal run of
  * consecutive duplicated window STARTS [s, e] covers exactly the
  * positions [s, e + k). So — unlike [[PassageDedup]]'s
  * winnowing-SAMPLED digests (the constant-factor scale path, window-
  * aligned granularity) — this operator reports the full extent of
  * every repeat at single-token granularity, with no minimum beyond k
  * and no sampling: the distributed equivalent of the paper's
  * suffix-array pass.
  *
  * 100 TB shape, two-phase exact counting:
  *   1. windows shuffle as 8-byte ROLLING digests only
  *      ([[graft.functions.WindowDigests]] — each token hashed once,
  *      windows combined by a Rabin–Karp prefix roll, amortized O(1)
  *      per token): one (hash, count) aggregate over tokens×8 B; the
  *      k-gram strings are never built in the map stage;
  *   2. the duplicated-hash list (true repeats + rare collisions)
  *      comes back as a join on the hash — broadcastable whenever
  *      duplication is sparse (AQE decides) — and only the surviving
  *      CANDIDATE positions rejoin the token frame and pay the O(k)
  *      gram slice for the exact group-by that eliminates hash
  *      collisions. Output volume is then proportional to the ACTUAL
  *      duplication, not the corpus.
  * The run-merge is one keyed window per document (never
  * whole-frame); the scrub is a narrow per-document filter over the
  * bounded merged-span list. */
object SubstringDedup {

  /** The normalized token frame `(idCol, __tk)` both phases derive
    * from — tokenized once, sliced only for surviving candidates.
    * Layout-decoupled ([[graft.PlanAudit.repartitionIfLayoutBound]]):
    * the tokenize + rolling-digest map work of phase 1 runs before the
    * digest-count shuffle and must not inherit a row-group-capped scan
    * (the r14 3.6–8.6× finding). */
  private def tokenFrame(df0: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val df = graft.PlanAudit.repartitionIfLayoutBound(df0)
    val toks = filter(Decontaminate.tokens(col(textCol)),
      w => length(w) > 0)
    df.select(col(idCol), toks.as("__tk"))
  }

  /** One row per k-token window: `(idCol, off, __h)` — `off` the
    * 1-based token offset, `__h` the rolling window digest
    * ([[graft.functions.WindowDigests]]: each token hashed once, the
    * k-window combined by a Rabin–Karp prefix roll — amortized O(1)
    * per token, no O(k) gram-string build). Documents shorter than k
    * contribute no rows. */
  def windowRows(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    require(k >= 2, s"window size must be >= 2, got $k")
    tokenFrame(df, idCol, textCol)
      .select(col(idCol),
        posexplode(graft.functions.WindowDigests
          .window_digests(col("__tk"), k)).as(Seq("__i", "__h")))
      .select(col(idCol), (col("__i") + 1).as("off"), col("__h"))
  }

  /** All window starts whose k-gram occurs ≥ 2 times corpus-wide —
    * `(idCol, off)`, exact (rolling-digest prefilter + string
    * verification over the surviving candidates only).
    *
    * `keepFirst = true` EXEMPTS each gram's canonical occurrence
    * (lowest doc id, then lowest offset) — the remove-all-but-one
    * policy that deduplicates without erasing the content from the
    * corpus entirely. The guarantee is per GRAM: a canonical
    * occurrence's positions can still be excised where a DIFFERENT
    * gram's non-canonical occurrence overlaps them (overlapping
    * repeats rarely share one canonical document) — the same caveat
    * every occurrence-level policy carries. */
  def duplicatedWindows(df: DataFrame, idCol: String, textCol: String,
      k: Int, keepFirst: Boolean = false): DataFrame = {
    val win = windowRows(df, idCol, textCol, k)
    // phase 1: counts over 8-byte rolling digests — the only
    // corpus-wide exchange, and the map side never builds a gram
    // string (equal windows ALWAYS share a digest, so no repeat can
    // be missed); phase 2: the candidate positions — output-sized
    // under sparse duplication, AQE broadcasts them — join back to
    // the token frame and ONLY THEY pay the O(k) gram slice for the
    // exact group-by that eliminates digest collisions
    val dupH = win.groupBy(col("__h"))
      .agg(count(lit(1)).as("__c")).filter(col("__c") >= 2)
      .select(col("__h"))
    val candPos = win.join(dupH, "__h").select(col(idCol), col("off"))
    val cand = candPos
      .join(tokenFrame(df, idCol, textCol), Seq(idCol))
      .select(col(idCol), col("off"),
        array_join(slice(col("__tk"), col("off"), lit(k)), " ")
          .as("gram"))
    val dupG = cand.groupBy(col("gram"))
      .agg(count(lit(1)).as("__c")).filter(col("__c") >= 2)
      .select(col("gram"))
    val dup = cand.join(dupG, "gram")
    if (!keepFirst) dup.select(col(idCol), col("off"))
    else {
      // per-gram keyed window over the CANDIDATES only (duplicated
      // grams — output-sized, never the corpus)
      val w = Window.partitionBy(col("gram"))
        .orderBy(col(idCol).asc, col("off").asc)
      dup.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") > 1)
        .select(col(idCol), col("off"))
    }
  }

  /** Maximal duplicated spans per document: `(idCol, span_start,
    * span_len)` in token units — consecutive duplicated window starts
    * merged, span = [span_start, span_start + span_len). The length is
    * ARBITRARY ≥ k: a 500-token verbatim repeat is one 500-token span.
    * One keyed window per document (off − row_number is constant
    * within a run — the classic gaps-and-islands merge, SQL-replayable). */
  def repeatedSpans(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame =
    spansFromWindows(duplicatedWindows(df, idCol, textCol, k), idCol, k)

  /** The run-merge alone, over a precomputed [[duplicatedWindows]]
    * frame — so a caller needing spans AND the scrub pays the
    * corpus-wide counting ONCE. */
  def spansFromWindows(dup: DataFrame, idCol: String,
      k: Int): DataFrame = {
    val w = Window.partitionBy(col(idCol)).orderBy(col("off"))
    dup.withColumn("__run", col("off") - row_number().over(w))
      .groupBy(col(idCol), col("__run"))
      .agg(min(col("off")).as("span_start"),
        (max(col("off")) - min(col("off")) + k).as("span_len"))
      .select(col(idCol), col("span_start"), col("span_len"))
  }

  /** Excise every duplicated-span token: adds `scrubbed` (the
    * normalized token stream minus covered positions) and `n_removed`.
    * Narrow reconstruction: the merged spans aggregate per document
    * (bounded by the document's window count), broadcast back by the
    * id join, and one pass filters each token against the span list —
    * O(tokens · spans-per-doc), zero additional corpus shuffles. */
  def scrubRepeats(df: DataFrame, idCol: String, textCol: String,
      k: Int, keepFirst: Boolean = false): DataFrame =
    scrubWithSpans(df,
      spansFromWindows(
        duplicatedWindows(df, idCol, textCol, k, keepFirst), idCol, k),
      idCol, textCol)

  /** The scrub alone, over a precomputed [[repeatedSpans]] frame —
    * pairs with [[spansFromWindows]] for the pay-once composition. */
  def scrubWithSpans(df: DataFrame, spanRows: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val spans = spanRows
      .groupBy(col(idCol))
      .agg(collect_list(struct(col("span_start"), col("span_len")))
        .as("__spans"))
    val toks = filter(Decontaminate.tokens(col(textCol)),
      w => length(w) > 0)
    val joined = df.join(spans, Seq(idCol), "left")
    val zipped = arrays_zip(toks.as("tok"),
      sequence(lit(1), greatest(size(toks), lit(1))).as("pos"))
    val covered = (e: Column) => exists(col("__spans"), s =>
      e.getField("pos") >= s.getField("span_start") &&
        e.getField("pos") <
          s.getField("span_start") + s.getField("span_len"))
    val kept = filter(zipped, e => !covered(e))
    joined
      .withColumn("scrubbed",
        when(col(textCol).isNull, lit(null).cast("string"))
          .when(col("__spans").isNull, concat_ws(" ", toks))
          .otherwise(concat_ws(" ",
            transform(kept, e => e.getField("tok")))))
      .withColumn("n_removed",
        when(col(textCol).isNull, lit(null).cast("long"))
          .when(col("__spans").isNull, lit(0L))
          .otherwise((size(zipped) - size(kept)).cast("long")))
      .drop("__spans")
  }
}
