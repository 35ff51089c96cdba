package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.{AsofJoin, RangeJoin, SkewJoin}
import Gate.t
import Det._

/** Join-shape gates beyond plain equi-joins: as-of, binned range, and
  * salted-skew — the three join forms Spark's built-ins don't cover (or
  * don't cover at scale) that time-series and training-data pipelines
  * lean on. Each has a full DuckDB oracle: the as-of gate against
  * DuckDB's native ASOF LEFT JOIN, the other two against the naive SQL
  * spelling their operator is a scalable rewrite of.
  */
object JoinGates {

  val gates: Seq[Gate] = Seq(

    // As-of join: each event sees the user's most recent purchase at or
    // before it. operators.AsofJoin — union + keyed running last, ONE
    // shuffle on user_id, no inequality join in the plan. The oracle is
    // DuckDB's native ASOF LEFT JOIN (purchase (user_id, ts) pairs are
    // unique in the synthetic data, so no tie-break divergence).
    Gate("j2_asof_join", (s, d) => {
      val ev = t(s, d, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value"))
      AsofJoin.backward(
        ev.select(col("event_id"), col("user_id"), col("ts")),
        purchases, "ts", "ts", Seq("user_id"), Seq("user_id"),
        Seq("value"), prefix = "ref_")
        .select(col("event_id"), col("user_id"),
          col("ref_ts"), col("ref_value"))
        .orderBy(col("event_id"))
    },
      Some("""WITH r AS (
             |  SELECT user_id, ts, value FROM events
             |  WHERE event_type = 'purchase')
             |SELECT l.event_id, l.user_id,
             |  r.ts AS ref_ts, r.value AS ref_value
             |FROM events l ASOF LEFT JOIN r
             |  ON l.user_id = r.user_id AND l.ts >= r.ts
             |ORDER BY event_id ASC NULLS FIRST""".stripMargin)),

    // Binned range join: clicks landing inside the 30 minutes before
    // each purchase, per user. operators.RangeJoin — intervals explode
    // into 30-minute bins, points bin once, plain shuffled equi-join on
    // (user_id, bin) + residual BETWEEN; the oracle is the naive
    // inequality join this decomposes (JoinOpsSpec asserts the plan has
    // no nested loop).
    Gate("j3_range_join", (s, d) => {
      val ev = t(s, d, "events")
      val points = ev.filter(col("event_type") === "click")
        .select(col("user_id"), unix_micros(col("ts")).as("pt"),
          col("value"))
      val intervals = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          (unix_micros(col("ts")) - lit(1800000000L)).as("w_start"),
          unix_micros(col("ts")).as("w_end"))
      RangeJoin.binned(points, intervals, "pt", "w_start", "w_end",
        Seq("user_id"), Seq("user_id"), binWidth = 1800000000L)
        .groupBy(col("purchase_id"))
        .agg(count(lit(1)).as("n_clicks"),
          dsum(col("value")).as("sum_click_value"))
        .orderBy(col("purchase_id"))
    },
      Some(s"""WITH p AS (
             |  SELECT user_id, epoch_us(ts) AS pt, value FROM events
             |  WHERE event_type = 'click'),
             |i AS (
             |  SELECT event_id AS purchase_id, user_id,
             |    epoch_us(ts) - 1800000000 AS w_start,
             |    epoch_us(ts) AS w_end
             |  FROM events WHERE event_type = 'purchase')
             |SELECT i.purchase_id, COUNT(*) AS n_clicks,
             |  ${dsumSql("p.value")} AS sum_click_value
             |FROM i JOIN p
             |  ON p.user_id = i.user_id AND p.pt BETWEEN i.w_start AND i.w_end
             |GROUP BY i.purchase_id
             |ORDER BY purchase_id ASC NULLS FIRST""".stripMargin)),

    // Salted skew join: lineitem × supplier on suppkey, 8-way salt. The
    // oracle is the UNSALTED join — the whole point is provable
    // equivalence while a hot key spreads over 8 shuffle partitions.
    Gate("j4_salted_skew", (s, d) => {
      val li = t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_suppkey"), col("l_extendedprice"))
      val sup = t(s, d, "supplier")
        .select(col("s_suppkey"), col("s_name"))
      SkewJoin.salted(li, sup, "l_suppkey", "s_suppkey", salts = 8,
        saltSource = struct(col("l_orderkey"), col("l_linenumber")))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("n_items"),
          dsum(col("l_extendedprice")).as("revenue"))
        .orderBy(col("s_name"))
    },
      Some(s"""SELECT s.s_name, COUNT(*) AS n_items,
             |  ${dsumSql("l.l_extendedprice")} AS revenue
             |FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
             |GROUP BY s.s_name
             |ORDER BY s_name ASC NULLS FIRST""".stripMargin))
  )
}
