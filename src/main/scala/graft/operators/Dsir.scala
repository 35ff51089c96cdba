package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** DSIR-shaped data selection: score raw-corpus documents by how much
  * more likely their tokens are under a TARGET distribution than under
  * the raw-corpus distribution, then keep the best slice — the
  * importance-resampling recipe of Xie et al., "Data Selection for
  * Language Models via Importance Resampling" (NeurIPS '23): bag-of-
  * token features, smoothed likelihood-ratio weights, weighted
  * selection toward the target domain.
  *
  * Engine-portable scoring contract (the t_bm25 fixed-point
  * discipline): each distinct (doc, token) pair contributes
  * `tf * ratio(token)` where
  *
  *   ratio = ((2*tgt+1) * (2*rawTot+V)) / ((2*raw+1) * (2*tgtTot+V))
  *
  * — Laplace-(1/2)-smoothed unigram probabilities over the UNION
  * vocabulary of size V — evaluated as one double-precision scalar
  * (integer-valued products and a single division are correctly rounded
  * under IEEE 754, so any engine computes the identical double; no
  * transcendentals, no accumulation), floor-quantized to 1e-6 fixed
  * point, then integer-summed per document (order-free). Documented
  * deviation from the paper: the paper sums LOG ratios; `log` is a
  * transcendental whose last bits vary across libm implementations, so
  * the portable contract sums the ratios themselves — same features,
  * same smoothing, per-token evidence monotone in the same direction,
  * bit-identical everywhere.
  *
  * 100 TB shape: the unigram models are token-keyed counts (map-side
  * combined — one narrow explode each side feeding a partial-aggregate
  * exchange of (token, count) pairs, never documents); the two totals
  * and V travel as one broadcast row. With `buckets = 0` the model join
  * is token-keyed (the oracle-exact form). With `buckets = B > 0`
  * tokens are hashed into B feature buckets first (the paper's hashed
  * n-gram features), making the model frame EXACTLY B rows — broadcast
  * — so the corpus side never shuffles for scoring at all; per-doc tf
  * and the final per-doc sum are the only keyed exchanges, both on the
  * doc id. Selection ranks with the range-partitioned [[Ordinals]]
  * ordinal — no single-partition window anywhere.
  *
  * Unlike [[Surprisal]]/[[Classifier]], DSIR deliberately has NO
  * literal-map narrow/streaming form: its contract is a global
  * top-pct RANK (keep the best slice of the corpus), which no
  * stream can express — a per-doc score alone doesn't select
  * anything until every competitor is seen. Callers who want a
  * streamable importance FILTER should threshold [[Surprisal]] or
  * [[Classifier]] margins instead.
  */
object Dsir {

  private val FP = 1e6

  /** (id, score_fp, n_tokens) for every raw document: the fixed-point
    * importance score under target-vs-raw smoothed unigram models.
    * `buckets = 0` keys features by the token itself; `buckets = B`
    * hashes tokens into B buckets (broadcastable model, paper shape). */
  def importanceScores(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, buckets: Int = 0): DataFrame = {
    require(buckets >= 0, s"buckets must be >= 0, got $buckets")
    def feat(df: DataFrame) = {
      val tok = df.select(col(idCol),
        explode(Decontaminate.tokens(col(textCol))).as("__tok"))
      if (buckets == 0) tok
      else tok.withColumn("__tok",
        pmod(xxhash64(col("__tok")), lit(buckets.toLong)).cast(StringType))
    }
    val rawTok = feat(raw)
    val tgtCnt = feat(target).groupBy("__tok")
      .agg(count(lit(1)).as("__ct"))
    val tf = rawTok.groupBy(col(idCol), col("__tok"))
      .agg(count(lit(1)).as("__tf"))
    // corpus counts re-aggregate the per-doc tf frame rather than
    // re-tokenizing the corpus: both branches consume the same (doc,
    // token) exchange (ReuseExchange), so the raw text is scanned once
    val rawCnt = tf.groupBy("__tok").agg(sum(col("__tf")).as("__cr"))
    // union-vocabulary model: raw-only tokens keep ct=0, target-only
    // tokens keep cr=0 (they still shape V and the totals)
    val model = rawCnt.join(tgtCnt, Seq("__tok"), "full_outer")
      .select(col("__tok"),
        coalesce(col("__cr"), lit(0L)).as("__cr"),
        coalesce(col("__ct"), lit(0L)).as("__ct"))
    val stats = model.agg(
      sum(col("__cr")).as("__rawTot"),
      sum(col("__ct")).as("__tgtTot"),
      count(lit(1)).as("__v"))
    val ratio =
      ((lit(2D) * col("__ct") + lit(1D)) *
        (lit(2D) * col("__rawTot") + col("__v"))) /
      ((lit(2D) * col("__cr") + lit(1D)) *
        (lit(2D) * col("__tgtTot") + col("__v")))
    tf.join(if (buckets > 0) broadcast(model) else model, Seq("__tok"))
      .crossJoin(broadcast(stats))
      .withColumn("__term_fp",
        floor(col("__tf") * ratio * lit(FP)).cast(LongType))
      .groupBy(col(idCol))
      .agg(sum(col("__term_fp")).as("score_fp"),
        sum(col("__tf")).as("n_tokens"))
  }

  /** Keep the ceil(pct%) of raw documents scoring highest under the
    * target model — all raw columns plus `score_fp`. Deterministic
    * total order (score desc, id asc) via the range-partitioned global
    * ordinal; raw documents with no scoreable token (null/empty text)
    * rank last in id order with a null score. */
  def select(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, pct: Double, buckets: Int = 0): DataFrame = {
    require(pct > 0 && pct <= 100, s"pct must be in (0, 100], got $pct")
    val scored = raw.join(
      importanceScores(raw, target, idCol, textCol, buckets),
      Seq(idCol), "left")
    val (ranked, total) = Ordinals.withGlobalOrdinalTotal(
      scored, "__ord",
      Seq(col("score_fp").desc_nulls_last, col(idCol).asc))
    val keep = math.ceil(total * pct / 100.0).toLong
    ranked.filter(col("__ord") <= keep).drop("__ord", "n_tokens")
  }
}
