package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stratified quality selection — keep the best slice of every stratum.
  *
  * The curation step after scoring: a corpus has per-document quality
  * signals (stopword ratio, LM surprisal, classifier margin …) and the
  * pipeline keeps only the best k documents — or the best fraction —
  * PER domain/language/source, so one over-represented stratum cannot
  * crowd the budget (the CCNet / FineWeb "quality bucket" shape, and the
  * reference's maxby-per-group generalized from 1 to k —
  * `group by "col" -> maxby exp`, /root/reference/tools/hobbes-vscode/
  * .vscode/hobbes-autocomplete.code-snippets:117-122).
  *
  * Determinism: ranking uses the total order (score DESC, id ASC) in
  * every engine — ties can never reorder across partitionings, and the
  * kept SET is a pure function of (scores, ids).
  *
  * 100 TB shape: one hash exchange on the stratum column feeds a
  * running `row_number` — rows stream through the window operator
  * (no per-stratum materialization). For [[topKPerStratum]] a map-side
  * prune runs BEFORE the exchange: each input partition locally keeps
  * its own top-k per stratum (sort_array over a per-partition
  * collect_list is bounded by k·strata-per-partition after the local
  * groupBy combine), so the exchange carries at most
  * partitions·strata·k rows, not the corpus — the classic distributed
  * top-k two-phase. [[topFracPerStratum]] needs every row's rank, so
  * the full stratum shuffles (unavoidable for a percentile cut); the
  * per-stratum count it thresholds against is derived in the same
  * window (no second exchange, no driver round trip). Skewed strata
  * spread across cores only in the pruned top-k path; a fractional cut
  * over ONE giant stratum is inherently single-partition at the window
  * — callers with that shape should pre-bucket the score (quantile
  * sketch) instead.
  */
object Selection {

  /** Keep the top `k` rows of each stratum by (score DESC, id ASC).
    * `scoreCol` must be numeric and non-null (a null score is an
    * upstream scoring bug — it RAISES in-plan rather than silently
    * ranking somewhere); `idCol` must be unique (the tie-break).
    *
    * Two-phase: a narrow per-partition prune (local top-k per stratum,
    * under the SAME total order as the global pass — anything else
    * could evict a global winner from the candidate set on a score
    * tie) bounds the exchange at partitions·strata·k rows; the global
    * row_number over the pruned survivors picks the exact winners.
    * Output = input columns plus `rank` (1-based within stratum).
    */
  def topKPerStratum(df: DataFrame, stratumCol: String, scoreCol: String,
      idCol: String, k: Int): DataFrame = {
    require(k >= 1, s"topKPerStratum: k must be >= 1, got $k")
    val cols = df.columns
    val scoreChecked = when(col(scoreCol).isNull,
      raise_error(lit(s"topKPerStratum: null $scoreCol — score before selecting"))
        .cast(df.schema(scoreCol).dataType))
      .otherwise(col(scoreCol))
    // local phase: within each input partition, the top-k rows of each
    // stratum — a groupBy on (partition, stratum) with a bounded
    // collect. The partial aggregation (map-side combine) caps the
    // per-group buffer at the already-pruned local winners. Ascending
    // sort on (−score, id) = the global (score DESC, id ASC) order.
    val packed = struct(
      (negate(scoreChecked).as("__s") +: col(idCol).as("__i") +:
        cols.map(c => col(c).as(c))): _*)
    val local = df
      .withColumn("__part", spark_partition_id())
      .groupBy(col("__part"), col(stratumCol).as("__st"))
      .agg(slice(sort_array(collect_list(packed)), 1, k).as("__top"))
      .select(explode(col("__top")).as("__r"))
      .select(cols.map(c => col(s"__r.$c").as(c)): _*)
    // global phase: exact winners over the pruned candidate set.
    val w = Window.partitionBy(stratumCol)
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    local.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Keep the top `num`/`den` fraction of each stratum by
    * (score DESC, id ASC): rank ≤ ceil(frac · stratum-count), so every
    * non-empty stratum keeps at least one row. The fraction is a
    * RATIONAL (numerator/denominator) so the threshold is exact integer
    * arithmetic — `ceil(n·num/den)` computed as
    * `(n·num + den − 1) div den` — identical in every engine (a double
    * fraction would make the boundary row depend on last-bit rounding).
    * One exchange: rank and stratum count come from the same window
    * partition.
    */
  def topFracPerStratum(df: DataFrame, stratumCol: String,
      scoreCol: String, idCol: String, num: Int, den: Int): DataFrame = {
    require(den >= 1, s"topFracPerStratum: denominator must be >= 1, got $den")
    require(num >= 0 && num <= den,
      s"topFracPerStratum: need 0 <= num <= den, got $num/$den")
    val w = Window.partitionBy(stratumCol)
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    val wAll = Window.partitionBy(stratumCol)
    df.withColumn("rank", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(wAll))
      .filter(col("rank") <=
        expr(s"(__n * $num + ${den - 1}) div $den"))
      .drop("__n")
  }
}
