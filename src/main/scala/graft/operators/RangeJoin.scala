package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join without a nested-loop plan.
  *
  * The naive spelling — `p.key = i.key AND p.t BETWEEN i.s AND i.e` —
  * gives Spark an equi-key plus two inequalities; with no equality on a
  * high-cardinality column beyond the key, skewed keys degrade to giant
  * sort-merge groups, and with NO key it degrades to
  * BroadcastNestedLoop/Cartesian: quadratic at scale.
  *
  * This is the standard binning decomposition: pick a bin width W,
  * explode each interval into the bins it overlaps
  * (floordiv(s, W) .. floordiv(e, W)), bin each point once
  * (floordiv(t, W)), and equi-join on (key, bin). A point's bin is
  * unique and an interval covers each of its bins exactly once, so each
  * qualifying (interval, point) pair appears EXACTLY once after the
  * residual `between` filter — no dedup stage. The join is a plain
  * shuffled equi-join: AQE can split skewed bins, partial aggregates
  * push below it, and the plan never contains a nested loop.
  *
  * Cost model: interval replication = len/W + 1 rows per interval, and
  * every point pairs with every candidate interval sharing its bin.
  * Choose W near the typical interval length (p95 is a good default) —
  * W too small explodes intervals, W too large admits more false
  * candidates for the residual filter to discard. Both inputs stream;
  * nothing is collected or broadcast.
  *
  * Bounds are LONGs (epoch micros, ordinals, …) — callers convert
  * timestamps with unix_micros(). Intervals are inclusive on both ends;
  * rows with NULL or inverted bounds (s > e) match nothing, like the
  * SQL BETWEEN they replace.
  */
object RangeJoin {

  /** Exact floor division on longs. `Column./` coerces to double (loses
    * exactness past 2^53) and `div` truncates toward zero (misaligns
    * bins for negative values) — subtracting the non-negative pmod first
    * makes the numerator an exact multiple, so `div` IS floor division
    * at any magnitude. */
  private def fdiv(c: Column, w: Long): Column =
    call_function("div", c - pmod(c, lit(w)), lit(w))

  /** Inner-join `points` to the `intervals` whose [startCol, endCol]
    * contains pointCol, on equal by-keys. Every column of both inputs
    * survives (by-key columns once, under the left/point names).
    */
  def binned(points: DataFrame, intervals: DataFrame,
      pointCol: String, startCol: String, endCol: String,
      pointKeys: Seq[String], intervalKeys: Seq[String],
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    require(pointKeys.size == intervalKeys.size,
      s"by-key arity mismatch: $pointKeys vs $intervalKeys")
    require(!points.columns.contains("__bin") &&
      !intervals.columns.contains("__bin"), "__bin is reserved")

    // Both sides are ALIASED and every join/filter/projection column is
    // plan-qualified: when points and intervals derive from the same
    // frame (a self range-join), dataframe-column references on the two
    // sides carry the SAME attribute ids and `pts(k) === ivals(k)`
    // builds a trivially-true predicate that only works because Spark's
    // dataset-id disambiguation repairs it (with a WARN). Qualified
    // references resolve against the aliases at analysis — no repair,
    // no WARN, stable across Spark upgrades.
    def q(side: String, c: String) = col(s"$side.`$c`")
    val ivals = intervals
      .filter(col(startCol).isNotNull && col(endCol).isNotNull &&
        col(startCol) <= col(endCol))
      .withColumn("__bin",
        explode(sequence(fdiv(col(startCol), binWidth),
          fdiv(col(endCol), binWidth))))
      .alias("__rj_i")
    val pts = points
      .filter(col(pointCol).isNotNull)
      .withColumn("__bin", fdiv(col(pointCol), binWidth))
      .alias("__rj_p")

    val joinCond = (pointKeys.zip(intervalKeys)
      .map { case (pk, ik) => q("__rj_p", pk) === q("__rj_i", ik) } :+
      (q("__rj_p", "__bin") === q("__rj_i", "__bin"))).reduce(_ && _)
    val dupIvalCols = intervalKeys.toSet + "__bin"
    pts.join(ivals, joinCond, "inner")
      .filter(q("__rj_p", pointCol) >= q("__rj_i", startCol) &&
        q("__rj_p", pointCol) <= q("__rj_i", endCol))
      .select(points.columns.toIndexedSeq.map(q("__rj_p", _)) ++
        intervals.columns.filterNot(dupIvalCols.contains)
          .map(q("__rj_i", _)): _*)
  }
}
