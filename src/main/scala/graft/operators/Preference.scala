package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Preference-pair (DPO/RLHF reward-model) artifact emitter.
  *
  * Given scored candidate responses grouped by prompt, emit one
  * `(chosen, rejected)` pair per prompt: chosen is the highest-scored
  * candidate, rejected the lowest, with deterministic tie-breaks so the
  * artifact is engine- and partitioning-stable (DPO: Rafailov et al.
  * 2023; the pairing rule — best vs worst with a minimum margin — is
  * the standard reward-data construction from Ouyang et al. 2022).
  *
  * Tie-breaks: chosen prefers the SMALLEST id among max-score
  * candidates, rejected the LARGEST id among min-score candidates, so
  * a fully-tied group still yields a valid (distinct) pair. Groups with
  * fewer than two candidates, or margin below `minMarginFp`, are
  * dropped — a pair whose scores are indistinguishable teaches the
  * reward model nothing.
  *
  * 100 TB design: ONE keyed aggregation (max_by/min_by with struct
  * orderings — map-side combine, no window, no self-join); the shuffle
  * carries one combiner row per (partition, prompt), and scores are
  * caller-provided integers so the margin filter is exact.
  */
object Preference {

  /** Emit `(group, chosen, rejected)` preference pairs.
    *
    * @param df          candidates: one row per (prompt, response)
    * @param groupCol    prompt/grouping column
    * @param idCol       unique candidate id (tie-break order)
    * @param textCol     response payload column
    * @param scoreCol    integer score (fixed-point if fractional)
    * @param minMarginFp drop pairs with chosen-rejected margin below
    */
  def preferencePairs(df: DataFrame, groupCol: String, idCol: String,
      textCol: String, scoreCol: String,
      minMarginFp: Long = 1L): DataFrame = {
    require(minMarginFp >= 0L,
      s"minMarginFp must be >= 0, got $minMarginFp")
    // lexicographic struct ordering (-score, id): its MIN is the
    // max-score candidate with the smallest id on ties (chosen), its
    // MAX the min-score candidate with the largest id (rejected) — a
    // fully-tied group still produces a distinct pair. The id keeps its
    // natural type (long, string, ...), only the score must be integer.
    val payload = struct(col(idCol).as("_id"), col(textCol).as("_t"),
      col(scoreCol).cast("long").as("_s"))
    val ord = struct((-col(scoreCol).cast("long")).as("_ns"),
      col(idCol).as("_i"))
    df.groupBy(col(groupCol))
      .agg(
        min_by(payload, ord).as("__c"),
        max_by(payload, ord).as("__r"),
        count(lit(1)).as("n_candidates"))
      .filter(col("n_candidates") >= 2 &&
        col("__c._s") - col("__r._s") >= minMarginFp)
      .select(col(groupCol),
        col("__c._id").as("chosen_id"), col("__r._id").as("rejected_id"),
        col("__c._t").as("chosen"), col("__r._t").as("rejected"),
        col("__c._s").as("chosen_score_fp"),
        col("__r._s").as("rejected_score_fp"),
        (col("__c._s") - col("__r._s")).as("margin_fp"),
        col("n_candidates"))
  }
}
