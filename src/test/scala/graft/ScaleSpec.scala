package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.window.WindowExec

/** Plan-shape scale invariance (SCALE.md §"Measured scaling"): the same
  * gate planned against sf0.01 and sf0.1 must produce the same plan
  * SHAPE — same number of exchanges, same number of whole-frame
  * (no-partition) windows. A shape that degrades with input size (an
  * extra shuffle, a window collapsing to one partition) is exactly the
  * failure mode that turns a working sf0.01 query into a 100 TB
  * scale-killer, and it cannot hide behind timing noise the way a
  * wall-clock ratio can.
  *
  * Gates here are the LAZY ones (plan construction runs no jobs beyond
  * tiny driver probes); the fit/checkpoint-eager operators are covered
  * by the measured-ratio table in SCALE.md instead.
  */
class ScaleSpec extends AnyFunSuite {

  lazy val spark = Sessions.local()

  private val sfs = Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")

  /** (exchanges, whole-frame windows) — the two shape degradations that
    * matter at scale. Counted on the pre-execution physical plan (AQE
    * unwrapped), so nothing is executed. */
  private def signature(df: DataFrame): (Int, Int) = {
    val p: SparkPlan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    val exch = PlanChecks.shuffles(df).size
    val wholeFrameWindows = p.collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }.size
    (exch, wholeFrameWindows)
  }

  // gates whose construction is lazy (no eager fit / localCheckpoint):
  // core relational, window, hb-surface, text/sampling/packing, ANN
  // brute-force
  private val lazyGates = Seq(
    "a1_group_sum", "a2_group_maxby", "a4_reductions", "a5_pivot",
    "a6_buckets", "a8_each_mean", "p4_only_filter", "p5_dense_rows",
    "p9_sort_by", "j1_join_outer", "j1_join_broadcast_agg",
    "j2_asof_join", "j3_range_join", "j4_salted_skew", "w1_moving_avg",
    "w2_expanding_sum", "w6_ordinals", "w7_resample_ffill", "hb_velocity",
    "hb_series_window",
    "t_token_count", "t_quality_score", "t_hash_split", "t_pack_layout",
    "t_top_ngrams", "t_mix_sample", "t_repetition", "t_chunk", "hb_chunk",
    "t_decontaminate", "t_bm25", "t_top_ngrams_by_lang", "t_mix_report",
    "t_c4_filter", "t_length_quantiles", "d_exact_dedup", "s_ann_topk",
    "s_embed_quantize", "s_ann_topk_q8",
    // r8: configuration combinators + text-signal expressions
    "hb_decontaminate_cfg", "hb_asof_cfg", "hb_range_cfg",
    "hb_quality_filter", "hb_langid_signal",
    // r8: vocab encode (DSIR gates are Ordinals-eager — covered by the
    // SCALE.md measured-ratio table; streaming gates execute on
    // construction)
    "t_vocab_encode", "hb_encode",
    // r9: the MMR pair is fit-free (exact pool + group walk — lazy);
    // the pq/ivf neighbors gates run Lloyd fits at construction and
    // are covered by SCALE.md's measured-ratio table instead
    "s_ann_mmr", "hb_neighbors_mmr",
    // r9: surprisal/classifier (broadcast hashed models, lazy joins),
    // stratified selection (pure windows), weighted rebalance (in-plan
    // cuts). BPE/shuffle/k-center fit or number eagerly at
    // construction — covered by SCALE.md's measured-ratio table.
    "t_lm_surprisal", "hb_surprisal_cfg", "t_select_topk",
    "t_select_topfrac", "hb_select_topk", "t_nb_classify",
    "hb_classifier_cfg", "t_rebalance_tokens", "hb_rebalance_weight",
    // r10: upsampling is a pure narrow plan, the mixture plan is one
    // in-plan aggregate, pack stats extend the lazy layout cumsum.
    // The rest of the r10 wave collects or numbers eagerly at
    // construction (epochPlanFactors/vocabMap collect, Ordinals,
    // scrub checkpoints, streaming) — covered by SCALE.md's
    // measured-ratio table instead.
    "t_upsample", "hb_upsample", "t_epoch_plan", "t_pack_stats",
    // r11: the bin-packing layout and both sequence emitters are lazy
    // plans (shard exchange + fold/explode + bounded aggregates); the
    // BPE byte/big-fit gates train eagerly at construction — covered
    // by SCALE.md's measured-ratio table instead.
    "t_pack_bfd", "t_pack_emit", "hb_pack_bins",
    // late r11: retrieval (broadcast-restricted postings + RRF fusion),
    // preference pairing (one keyed aggregation) and semantic decon
    // (zero-shuffle narrow map) are all lazy plans
    "s_lexical_topk", "s_hybrid_rrf", "t_dpo_pairs", "hb_dpo_pairs",
    "s_semantic_decon", "hb_retrieve_cfg", "e12_modulo",
    // r12: the BM25 lexical ranker and the three-list fusion are lazy
    // plans (broadcast-restricted postings + one corpus aggregate +
    // per-query windows). The tokenizer export round-trips, the
    // target-vocab unigram fit and the pretrain flagship all train
    // eagerly at construction — covered by SCALE.md's measured-ratio
    // table instead.
    "s_lexical_bm25", "s_hybrid_rrf3",
    // late r12: temperature mix (one bounded count aggregate + narrow
    // cut), fill-in-middle and normalization (pure narrow maps), and
    // the position-ids emit (the lazy packed layout + one aggregate)
    "t_temperature_mix", "hb_mix_temperature", "t_fim", "hb_fim",
    "t_normalize", "hb_normalize", "t_position_ids",
    // length-bucketed batching: the range-partitioned ordinal (the
    // w6_ordinals plan) + one keyed batch aggregate
    "t_length_batches",
    // r13: exact substring dedup (two digest/candidate aggregates +
    // one keyed run-merge window + the narrow scrub), fim with
    // reserved sentinels (the fim narrow map + the specials encode —
    // the 6-round fit is eager, the data plan is lazy), and the exact
    // spanning positions (the t_pack_emit plan + one more aggregate
    // column). The specials/SFT fits and the fallback stored-model
    // path train eagerly at construction — covered by SCALE.md's
    // measured-ratio table instead.
    "d_substring_dedup", "t_position_ids_exact", "t_fim_specials")

  test("plan shape is scale-invariant from sf0.01 to sf0.1 " +
    "(same exchanges, same whole-frame windows)") {
    lazyGates.foreach { name =>
      val sigs = sfs.map(d =>
        signature(SparkEntry.queries(name)(spark, d)))
      assert(sigs.distinct.size == 1,
        s"$name plan shape changed with scale: " +
          s"${sfs.zip(sigs).map { case (d, s) =>
            s"$d -> (exchanges=${s._1}, wholeFrameWindows=${s._2})"
          }.mkString("; ")}")
    }
  }

  test("whole-frame windows appear only where the series opt-out or " +
    "post-aggregation smallness makes them bounded") {
    // hb_series_window opted into keyed execution: ZERO whole-frame
    // windows at either sf — the 100 TB path stays keyed as data grows
    sfs.foreach { d =>
      val (_, wf) = signature(SparkEntry.queries("hb_series_window")(spark, d))
      assert(wf == 0, s"hb_series_window has $wf whole-frame windows at $d")
    }
  }
}
