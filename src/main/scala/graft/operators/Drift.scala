package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus drift report — which tokens moved most between two corpus
  * snapshots (yesterday's crawl vs today's, corpus v1 vs v2, raw vs
  * post-curation). The QA table a pipeline owner reads after every
  * re-ingest: a token whose relative frequency jumped 50× usually
  * means a new spam template, a scraper regression, or a domain
  * landing in the mix.
  *
  * Scoring (the [[Dsir]] portability discipline): each union-vocabulary
  * token gets
  *
  *   ratio = ((cB+1) · (totA+V)) / ((cA+1) · (totB+V))
  *
  * — add-one-smoothed relative-frequency ratio of snapshot B over A,
  * evaluated as ONE IEEE-754 division of integer-valued products
  * (correctly rounded, no accumulation, no transcendentals), so any
  * engine computes the identical double and the identical ranking.
  * ratio > 1 = rising in B, < 1 = falling.
  *
  * 100 TB shape: each snapshot reduces to map-side-combined
  * (token, count) pairs — documents never shuffle; the join is
  * token-keyed; the two totals and V travel as one broadcast row; both
  * directional cuts are TakeOrdered(k) (never a global sort), and the
  * only window runs over an already-cut ≤k-row frame. */
object Drift {

  /** The 2k most-moved tokens: the k largest ratios (`rising`, rank by
    * ratio DESC, token ASC) and the k smallest (`falling`, rank by
    * ratio ASC, token ASC) — a total order, so the report is a pure
    * function of the two snapshots. Output: (direction, rank, token,
    * cnt_a, cnt_b, ratio). */
  def topMovers(a: DataFrame, b: DataFrame, textCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    def counts(df: DataFrame, as: String) = df
      .select(explode(Decontaminate.tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as(as))
    val m = counts(a, "cnt_a").join(counts(b, "cnt_b"),
        Seq("token"), "full_outer")
      .select(col("token"),
        coalesce(col("cnt_a"), lit(0L)).as("cnt_a"),
        coalesce(col("cnt_b"), lit(0L)).as("cnt_b"))
    val stats = m.agg(sum(col("cnt_a")).as("__ta"),
      sum(col("cnt_b")).as("__tb"), count(lit(1)).as("__v"))
    val scored = m.crossJoin(broadcast(stats))
      .withColumn("ratio",
        ((col("cnt_b") + lit(1D)) * (col("__ta") + col("__v"))) /
          ((col("cnt_a") + lit(1D)) * (col("__tb") + col("__v"))))
      .select(col("token"), col("cnt_a"), col("cnt_b"), col("ratio"))
    def cut(dirName: String, order: Seq[org.apache.spark.sql.Column]) = {
      // TakeOrdered keeps the frame ≤ k rows; the rank window below
      // runs over that bounded frame only (the Vocab.fit discipline)
      val w = org.apache.spark.sql.expressions.Window.orderBy(order: _*)
      scored.orderBy(order: _*).limit(k)
        .withColumn("rank", row_number().over(w).cast(IntegerType))
        .withColumn("direction", lit(dirName))
    }
    cut("rising", Seq(col("ratio").desc, col("token").asc))
      .unionByName(cut("falling", Seq(col("ratio").asc, col("token").asc)))
      .select(col("direction"), col("rank"), col("token"),
        col("cnt_a"), col("cnt_b"), col("ratio"))
  }

  /** Document-level snapshot diff — the doc-granularity complement of
    * [[topMovers]]: every id in either snapshot labeled `added`
    * (only in B), `removed` (only in A), `changed` (both, normalized
    * content digest differs — [[Dedup.fingerprint]], the exact-dedup
    * identity) or `unchanged`. The membership table an ingest review
    * reads before promoting a new corpus version.
    *
    * 100 TB shape: each side reduces to (id, 32-byte digest) in the
    * scan stage; the diff is one id-keyed full-outer join — documents
    * never shuffle. */
  def snapshotDiff(a: DataFrame, b: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    def fps(df: DataFrame, as: String) = df.select(col(idCol),
      Dedup.fingerprint(col(textCol)).as(as))
    fps(a, "__fa").join(fps(b, "__fb"), Seq(idCol), "full_outer")
      .withColumn("status",
        when(col("__fa").isNull, lit("added"))
          .when(col("__fb").isNull, lit("removed"))
          .when(col("__fa") === col("__fb"), lit("unchanged"))
          .otherwise(lit("changed")))
      .select(col(idCol), col("status"))
  }
}
