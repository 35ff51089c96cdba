package graft
/** Dev tool: dump formatted physical plans for representative gates. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    val d = "/root/testdata/sf0.01"
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("a1_group_sum", "j1_join_broadcast_agg", "hb_velocity",
        "d_exact_dedup", "w1_moving_avg", "d_ngram_jaccard", "w6_ordinals",
        "a6_buckets", "d_embed_cosine_kmeans", "hb_linreg",
        "hb_series_pipeline", "s_ann_rplsh", "t_top_ngrams",
        "t_hash_split", "t_pack_layout", "t_decontaminate", "t_chunk",
        "d_passage_dedup", "t_bm25", "t_top_ngrams_by_lang",
        "a7_kmeans", "s2_rest_provider", "s5_localdata",
        "t_dsir_select", "t_vocab_encode",
        "t_lm_surprisal", "t_nb_classify", "t_select_topk",
        "t_shuffle_order", "t_rebalance_tokens",
        // r11: bin packing + sequence emitters
        "t_pack_bfd", "t_pack_emit", "t_sft_artifact",
        // r11: retrieval + preference pairing
        "s_lexical_topk", "s_hybrid_rrf", "t_dpo_pairs", "t_wordpiece",
        // r13: specials encode, exact substring dedup, SFT artifact,
        // exact spanning positions
        "t_bpe_specials", "d_substring_dedup", "hb_sft_chat",
        "t_position_ids_exact", "hb_fim_ids",
        // r14: rolling-digest dedup shape, tags families, trainable
        // langid, OData pushdown scan
        "d_substring_keepfirst", "hb_wordpiece_tags", "t_langid_nb",
        "s1_odata_provider")
    names.foreach { q =>
      println(s"===== $q =====")
      println(SparkEntry.queries(q)(spark, d).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
