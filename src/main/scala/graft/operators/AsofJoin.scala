package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal "most recent prior") join — the operator Spark's
  * DataFrame API lacks but every time-series/feature pipeline needs:
  * for each left row, the single right row with the greatest
  * `rightTime <= leftTime` (backward; inclusive) among rows with equal
  * by-keys, left-outer (unmatched left rows keep NULL right columns).
  * Same semantics as DuckDB/pandas `ASOF LEFT JOIN` / `merge_asof`.
  *
  * NOT a join in the physical plan: a naive SQL spelling
  * (`t >= r.t` + row_number) is an inequality join — Spark plans
  * BroadcastNestedLoop / Cartesian, quadratic per key. This is instead
  * the union-window formulation: tag both inputs, union them, and take
  * a running `last(right_struct, ignoreNulls)` over
  * (partition by keys, order by time). ONE hash shuffle on the by-keys,
  * a per-key sort, zero replication — the same partitioning any
  * downstream keyed op reuses, so it scales exactly like a groupBy:
  * 100 TB of left rows against 100 TB of right rows costs one co-shuffle.
  *
  * The right row travels as ONE struct, so a legitimately-NULL value
  * column can never splice values from different right rows (a
  * per-column `last(ignoreNulls)` would).
  *
  * Determinism: ties on (key, time) between multiple right rows resolve
  * to the greatest (time, values...) struct — a total order, so results
  * are stable across retries/partitionings. At equal left/right time the
  * right row is eligible (inclusive bound): right rows sort before left
  * rows within a timestamp.
  *
  * SQL-parity edges: a left row with a NULL by-key or NULL time matches
  * nothing (SQL comparison semantics — window partitioning would
  * otherwise group NULL keys together and match them).
  */
object AsofJoin {

  /** Backward as-of join (most recent right row at or before leftTime).
    *
    * Output: every left column, plus `prefix + rightTime` (the matched
    * row's time) and `prefix + v` for each v in `rightVals`.
    *
    * @param tolerance max allowed `leftTime - rightTime` as a Spark
    *   INTERVAL (or numeric) expression; matches older than it null out.
    */
  def backward(left: DataFrame, right: DataFrame,
      leftTime: String, rightTime: String,
      leftKeys: Seq[String], rightKeys: Seq[String],
      rightVals: Seq[String], prefix: String = "asof_",
      tolerance: Option[Column] = None): DataFrame =
    joined(left, right, leftTime, rightTime, leftKeys, rightKeys,
      rightVals, prefix, tolerance, forward = false)

  /** Forward as-of join (earliest right row at or after leftTime). */
  def forward(left: DataFrame, right: DataFrame,
      leftTime: String, rightTime: String,
      leftKeys: Seq[String], rightKeys: Seq[String],
      rightVals: Seq[String], prefix: String = "asof_",
      tolerance: Option[Column] = None): DataFrame =
    joined(left, right, leftTime, rightTime, leftKeys, rightKeys,
      rightVals, prefix, tolerance, forward = true)

  private def joined(left: DataFrame, right: DataFrame,
      leftTime: String, rightTime: String,
      leftKeys: Seq[String], rightKeys: Seq[String],
      rightVals: Seq[String], prefix: String,
      tolerance: Option[Column], forward: Boolean): DataFrame = {
    require(leftKeys.size == rightKeys.size,
      s"by-key arity mismatch: $leftKeys vs $rightKeys")
    val reserved = Seq("__t", "__side", "__rv", "__m")
    require(!left.columns.exists(reserved.contains),
      s"left must not contain ${reserved.mkString("/")}")

    // the right row travels as one struct: time first (it doubles as the
    // in-timestamp tie-break), then the value columns. A NULL right time
    // matches nothing in SQL/pandas asof semantics — but under the
    // backward sort it would order FIRST (nulls-first asc) with a
    // non-null struct and become everyone's fallback match, so those
    // rows must drop here
    val r = right
      .filter(col(rightTime).isNotNull)
      .select(
        rightKeys.zip(leftKeys).map { case (rk, lk) => col(rk).as(lk) } ++ Seq(
          col(rightTime).as("__t"),
          struct((col(rightTime).as(rightTime) +:
            rightVals.map(col)): _*).as("__rv"),
          lit(0).as("__side")): _*)
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
    val u = l.unionByName(r, allowMissingColumns = true)

    // right rows sort before left within a timestamp (__side 0 < 1) so
    // the inclusive bound holds in both directions; __rv asc makes the
    // greatest struct win right-side ties deterministically
    val timeOrd = if (forward) col("__t").desc else col("__t").asc
    val w = Window.partitionBy(leftKeys.map(col): _*)
      .orderBy(timeOrd, col("__side").asc, col("__rv").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matchedRaw = last(col("__rv"), ignoreNulls = true).over(w)

    // SQL-parity: NULL by-key or NULL time on the left matches nothing;
    // tolerance nulls out stale matches (whole struct, atomically)
    val nullKeyed = (leftKeys.map(col(_).isNull) :+ col(leftTime).isNull)
      .reduce(_ || _)
    val age =
      if (forward) matchedRaw(rightTime) - col(leftTime)
      else col(leftTime) - matchedRaw(rightTime)
    val matched0 = when(nullKeyed, lit(null)).otherwise(matchedRaw)
    val matched = tolerance match {
      case Some(tol) => when(age <= tol, matched0)
      case None => matched0
    }

    // the match column MUST materialize before the side filter — a
    // filtered frame would run the window over left rows only
    u.withColumn("__m", matched)
      .filter(col("__side") === 1)
      .select(left.columns.toIndexedSeq.map(col) ++
        (rightTime +: rightVals).map(v =>
          col("__m")(v).as(prefix + v)): _*)
  }
}
