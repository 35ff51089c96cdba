package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination — flag corpus documents sharing any word
  * n-gram with an evaluation set (the GPT-3/Llama-style contamination
  * filter every pretraining corpus runs before training).
  *
  * 100 TB shape: the eval side is a benchmark (thousands of documents,
  * not billions), so its distinct gram set is BROADCAST and the corpus
  * side never shuffles for the membership test — corpus grams are a
  * narrow explode feeding a broadcast-hash semi-join inside the scan
  * stage. The only exchange is the distinct over MATCHED doc ids
  * (bounded by the contamination rate, not the corpus), plus the
  * left join of that small hit set back onto the corpus (AQE
  * broadcasts it). Grams are built from aligned array slices +
  * arrays_zip, not a lambda over the tokenizer chain — see the
  * re-evaluation note on TextGates.t_top_ngrams.
  */
object Decontaminate {

  /** Whitespace tokens of the normalized, lowercased text. */
  def tokens(textCol: Column): Column =
    split(lower(regexp_replace(textCol, "\\s+", " ")), " ")

  /** Explode `df` into one row per word n-gram: (idCol, gram).
    * Documents with fewer than `n` tokens contribute no rows. */
  def ngramRows(df: DataFrame, idCol: String, toks: Column, n: Int): DataFrame = {
    require(n >= 1, s"n-gram size must be >= 1, got $n")
    val sliced = df.select(col(idCol) +: (0 until n).map { i =>
      val c = if (i == 0) toks
              else slice(toks, lit(i + 1), greatest(size(toks) - i, lit(0)))
      c.as(s"__g$i")
    }: _*)
    // arrays_zip pads the (shorter) shifted slices with null, so a null
    // last field marks the tail positions with no complete n-gram.
    sliced
      .select(col(idCol),
        explode(arrays_zip((0 until n).map(i => col(s"__g$i")): _*)).as("__z"))
      .filter(col(s"__z.__g${n - 1}").isNotNull)
      .select(col(idCol),
        concat_ws(" ", (0 until n).map(i => col(s"__z.__g$i")): _*).as("gram"))
  }

  /** All corpus rows plus a `contaminated` flag: true iff the document
    * shares at least one word n-gram with any document in `evalSet`. */
  def flag(corpus: DataFrame, evalSet: DataFrame, idCol: String,
      textCol: String, n: Int = 8): DataFrame = {
    // Reserved output/scratch names must not already exist on the
    // corpus — a pre-existing column would be silently overwritten
    // (same guard AsofJoin applies to its reserved names).
    Seq("contaminated", "__hit").foreach { c =>
      require(!corpus.columns.contains(c),
        s"corpus already has a '$c' column — rename it before Decontaminate.flag")
    }
    // The eval-side id is never used downstream (only distinct grams
    // survive) — a constant keeps the projection deterministic.
    val evalGrams = ngramRows(
      evalSet.select(lit(0L).as("__eid"), col(textCol)),
      "__eid", tokens(col(textCol)), n)
      .select("gram").distinct()
    val hits = ngramRows(corpus.select(col(idCol), col(textCol)),
      idCol, tokens(col(textCol)), n)
      .join(broadcast(evalGrams), "gram")
      .select(idCol).distinct()
    corpus
      .join(hits.withColumn("__hit", lit(true)), Seq(idCol), "left")
      .withColumn("contaminated", coalesce(col("__hit"), lit(false)))
      .drop("__hit")
  }

  /** The removal form: corpus rows with every contaminated document
    * dropped (an anti-join against the hit set). */
  def clean(corpus: DataFrame, evalSet: DataFrame, idCol: String,
      textCol: String, n: Int = 8): DataFrame =
    flag(corpus, evalSet, idCol, textCol, n)
      .filter(!col("contaminated")).drop("contaminated")

  /** SEMANTIC decontamination (the SemDedup-family complement to the
    * n-gram flag): a corpus document is contaminated when its embedding
    * cosine against ANY eval embedding reaches `thresholdFp` (fixed
    * point ×1e9) — catching paraphrased benchmark leakage that shares
    * no n-gram (Abbas et al. 2023 SemDedup; GPT-4's contamination
    * appendix uses the same shape). Adds `max_cos_fp` (the evidence —
    * floor(cos·1e9), -1e9 when a vector has zero norm) and
    * `contaminated`.
    *
    * 100 TB design: the eval set collapses to ONE broadcast row holding
    * its quantized vectors (eval benchmarks are bounded — thousands,
    * not billions), so the corpus pass is a pure narrow map: zero
    * shuffles, cost corpus × |eval| dot products. For an eval set too
    * big to broadcast, block first with Similarity.rpLshNearDup's
    * banding and verify only candidates. Cosines use the fixed-point
    * quantization ([[Similarity.quantize]]) so the floor(·1e9) evidence
    * replays exactly in a SQL oracle. */
  def semanticFlag(corpus: DataFrame, evalSet: DataFrame, idCol: String,
      vecCol: String, thresholdFp: Long): DataFrame = {
    require(thresholdFp >= -1000000000L && thresholdFp <= 1000000000L,
      s"thresholdFp is fixed-point cosine ×1e9, got $thresholdFp")
    Seq("contaminated", "max_cos_fp", "__evals", "__enorms").foreach { c =>
      require(!corpus.columns.contains(c),
        s"corpus already has a '$c' column — rename it before semanticFlag")
    }
    val qv = Similarity.quantize(col(vecCol))
    // one struct collect, split into aligned arrays by one transform
    // pass — never two parallel collect_lists (alignment would ride on
    // traversal order)
    val evalRow = evalSet
      .select(qv.as("__ev"), Similarity.normQ(qv).as("__en"))
      .agg(collect_list(struct(col("__ev"), col("__en"))).as("__s"))
      .select(
        transform(col("__s"), x => x.getField("__ev")).as("__evals"),
        transform(col("__s"), x => x.getField("__en")).as("__enorms"))
    // the max-cosine loop is ONE native codegen'd expression
    // (functions.MaxCosQ): the row's quantization and norm compute once
    // per row, not once per eval element — the HOF formulation this
    // replaces ran interpreted and re-derived both per element
    // (measured ~10 s vs ~0.3 s at 495 rows × 4.5k evals)
    corpus.crossJoin(broadcast(evalRow))
      .withColumn("max_cos_fp", graft.functions.MaxCosQ.max_cos_q(
        qv, col("__evals"), col("__enorms")))
      .drop("__evals", "__enorms")
      .withColumn("contaminated", col("max_cos_fp") >= thresholdFp)
  }
}
