package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Gate.t
import Det._

/** Ordered / windowed computation gates — the time-series core of the
  * reference (SURVEY §2.6: moving, expanding, linear regression,
  * extrapolation, keys, ordinals).
  *
  * Scale note: hobbes's `moving`/`expanding` are whole-frame ordered
  * windows. Here they are keyed by `user_id` (Window.partitionBy), which is
  * the 100 TB-safe form — each user's series lives in one partition and no
  * global single-partition window is needed. The whole-frame variant is
  * what the `.hb` engine's exact mode emits (see graft.engine).
  */
object WindowGates {

  private val dec6 = DecimalType(30, 6)

  val gates: Seq[Gate] = Seq(

    // W1 `moving <red> <window>` — trailing window of N points, missing
    // for the first N-1 rows (snippets:182-189; Velocity.hb:30-31).
    Gate("w1_moving_avg", (s, d) => {
      val ord = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val frame = ord.rowsBetween(-6, 0)
      t(s, d, "events")
        .withColumn("rn", row_number().over(ord))
        .withColumn("mov_avg",
          when(col("rn") >= 7,
            sum(col("value").cast(dec6)).over(frame).cast(DoubleType) / lit(7)))
        .select("event_id", "user_id", "value", "mov_avg")
        .orderBy(col("event_id"))
    },
      Some("""SELECT event_id, user_id, value,
             |  CASE WHEN ROW_NUMBER() OVER w >= 7 THEN
             |    CAST(SUM(CAST(value AS DECIMAL(30,6))) OVER
             |      (w ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) / 7
             |  END AS mov_avg
             |FROM events
             |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
             |ORDER BY event_id ASC NULLS FIRST""".stripMargin)),

    // W2 `expanding <red>` — running reduction from start (snippets:190-197).
    Gate("w2_expanding_sum", (s, d) => {
      val frame = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
      t(s, d, "events")
        .withColumn("running_sum",
          sum(col("value").cast(dec6)).over(frame).cast(DoubleType))
        .select("event_id", "user_id", "value", "running_sum")
        .orderBy(col("event_id"))
    },
      Some("""SELECT event_id, user_id, value,
             |  CAST(SUM(CAST(value AS DECIMAL(30,6))) OVER
             |    (PARTITION BY user_id ORDER BY ts, event_id
             |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             |  AS running_sum
             |FROM events ORDER BY event_id ASC NULLS FIRST""".stripMargin)),

    // W3 `linear regression [x] [y]` (snippets:198-205). Slope/intercept
    // from exact decimal sums — deterministic across engines, unlike the
    // built-in regr_slope whose accumulation order varies.
    Gate("w3_linear_regression", (s, d) => {
      val x = col("event_id").cast(DoubleType)
      val y = col("value")
      val agg = t(s, d, "events")
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(x.cast(dec6)).cast(DoubleType).as("sx"),
          sum(y.cast(dec6)).cast(DoubleType).as("sy"),
          sum((x * y).cast(DecimalType(38, 12))).cast(DoubleType).as("sxy"),
          sum((x * x).cast(DecimalType(38, 12))).cast(DoubleType).as("sxx"))
      // round(…, 9): the unrounded doubles can differ between engines by
      // 1-2 ulps (e.g. FMA contraction in the division-multiply chain);
      // both Spark and DuckDB round ties away from zero, so 9 decimals is
      // a stable meeting point. `+ 0.0` after the round: a slope that
      // rounds to zero from below is -0.0 in DuckDB's ROUND (IEEE
      // double) but +0.0 in Spark's (BigDecimal path, no signed zero) —
      // adding positive zero maps -0.0 → +0.0 in both engines and is
      // the identity everywhere else (caught at sf1: event_type='error'
      // slope printed 0.0 vs -0.0).
      agg.select(col("event_type"),
        (round((col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx")), 9) + lit(0.0))
          .as("slope"),
        (round((col("sy") - ((col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx"))) * col("sx")) /
          col("n"), 9) + lit(0.0)).as("intercept"))
        .orderBy(col("event_type"))
    },
      Some("""SELECT event_type,
             |  ROUND((n*sxy - sx*sy) / (n*sxx - sx*sx), 9) + 0.0 AS slope,
             |  ROUND((sy - ((n*sxy - sx*sy) / (n*sxx - sx*sx)) * sx) / n, 9) + 0.0 AS intercept
             |FROM (
             |  SELECT event_type, COUNT(*) AS n,
             |    CAST(SUM(CAST(CAST(event_id AS DOUBLE) AS DECIMAL(30,6))) AS DOUBLE) AS sx,
             |    CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sy,
             |    CAST(SUM(CAST(CAST(event_id AS DOUBLE) * value AS DECIMAL(38,12))) AS DOUBLE) AS sxy,
             |    CAST(SUM(CAST(CAST(event_id AS DOUBLE) * CAST(event_id AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE) AS sxx
             |  FROM events GROUP BY event_type)
             |ORDER BY event_type ASC NULLS FIRST""".stripMargin)),

    // W4 `linear extrapolation` — fit on the last nTrain points, append
    // nPredict predicted rows (snippets:206-213). The reference's version
    // crashes its calculator (Metrics.fs:69-71); this one is the fix.
    // Deterministic end to end: the training tail is tie-broken on (x, y)
    // (equal pairs at the cut are interchangeable for the fit), predictions
    // are ROUND(…, 9) like w3 — so a full SQL oracle applies.
    Gate("w4_extrapolation", (s, d) => {
      val ev = t(s, d, "events")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).cast(DoubleType).as("x"),
          dsum(col("value")).as("y"))
      val nTrain = 50
      val nPredict = 10
      val tail = ev.orderBy(col("x").desc, col("y").desc).limit(nTrain)
      val fit = tail.agg(
        count(lit(1)).as("n"),
        sum(col("x").cast(dec6)).cast(DoubleType).as("sx"),
        sum(col("y").cast(dec6)).cast(DoubleType).as("sy"),
        sum((col("x") * col("y")).cast(DecimalType(38, 12)))
          .cast(DoubleType).as("sxy"),
        sum((col("x") * col("x")).cast(DecimalType(38, 12)))
          .cast(DoubleType).as("sxx"),
        // the tail IS the top-nTrain frame by x desc, so its max(x) is
        // the whole frame's max(x) — no separate scan of ev needed
        max(col("x")).as("maxx"))
        .select(
          ((col("n") * col("sxy") - col("sx") * col("sy")) /
            (col("n") * col("sxx") - col("sx") * col("sx"))).as("slope"),
          col("sy"), col("sx"), col("n"), col("maxx"))
      val preds = s.range(1, nPredict + 1).toDF("i")
        .crossJoin(broadcast(fit))
        .select((col("maxx") + col("i")).as("x"),
          // + 0.0: -0.0 vs +0.0 engine divergence after ROUND, as in w3
          (round(col("sy") / col("n") +
            col("slope") * (col("maxx") + col("i") - col("sx") / col("n")), 9)
            + lit(0.0)).as("y"),
          lit(true).as("predicted"))
      ev.withColumn("predicted", lit(false))
        .select("x", "y", "predicted")
        .unionByName(preds)
        .orderBy(col("x"), col("y"))
    },
      Some("""WITH ev AS (
             |  SELECT CAST(COUNT(*) AS DOUBLE) AS x,
             |    CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS y
             |  FROM events GROUP BY user_id),
             |tail AS (SELECT * FROM ev ORDER BY x DESC, y DESC LIMIT 50),
             |fit AS (
             |  SELECT COUNT(*) AS n,
             |    CAST(SUM(CAST(x AS DECIMAL(30,6))) AS DOUBLE) AS sx,
             |    CAST(SUM(CAST(y AS DECIMAL(30,6))) AS DOUBLE) AS sy,
             |    CAST(SUM(CAST(x*y AS DECIMAL(38,12))) AS DOUBLE) AS sxy,
             |    CAST(SUM(CAST(x*x AS DECIMAL(38,12))) AS DOUBLE) AS sxx
             |  FROM tail),
             |mx AS (SELECT MAX(x) AS maxx FROM ev),
             |preds AS (
             |  SELECT maxx + i AS x,
             |    ROUND(sy/n + ((n*sxy - sx*sy)/(n*sxx - sx*sx))
             |      * (maxx + i - sx/n), 9) + 0.0 AS y,
             |    TRUE AS predicted
             |  FROM range(1, 11) t(i), fit, mx)
             |SELECT x, y, predicted FROM (
             |  SELECT x, y, FALSE AS predicted FROM ev
             |  UNION ALL SELECT x, y, predicted FROM preds)
             |ORDER BY x ASC NULLS FIRST, y ASC NULLS FIRST""".stripMargin)),

    // W6 `ordinals` — row ordinal reification (hobbes.YAML-tmLanguage:10).
    // Scale-safe: range-partitioned ordinal (operators.Ordinals), not a
    // single-partition global window.
    // Resample + forward-fill onto a regular daily grid — the gap-fill
    // every time-series dashboard needs, composed from the engine's own
    // primitives: a per-user grid (distinct users × broadcast one-row
    // bounds × sequence explode — narrow) forward-filled by
    // AsofJoin.backward (ONE co-shuffle on user_id, no inequality
    // join). Events are pre-deduped to one row per (user, ts) with
    // max(value) so the as-of tie-break is moot on both engines; the
    // fill COPIES a value (no arithmetic), so doubles pass through
    // bit-exactly. Oracle: DuckDB's native ASOF LEFT JOIN over the
    // same grid.
    Gate("w7_resample_ffill", (s, d) => {
      val ev0 = t(s, d, "events").select(col("user_id"), col("ts"),
        col("value"))
      val ev = ev0.groupBy("user_id", "ts").agg(max("value").as("value"))
      val bounds = ev0.agg(
        to_date(min("ts")).cast(TimestampType).as("t0"),
        to_date(max("ts")).cast(TimestampType).as("t1"))
      val grid = ev0.select("user_id").distinct()
        .crossJoin(broadcast(bounds))
        .select(col("user_id"),
          explode(sequence(col("t0"), col("t1"), expr("interval 1 day")))
            .as("grid_ts"))
      graft.operators.AsofJoin.backward(grid, ev, "grid_ts", "ts",
        Seq("user_id"), Seq("user_id"), Seq("value"))
        .orderBy(col("user_id"), col("grid_ts"))
    },
      Some("""WITH ev AS (
             |  SELECT user_id, ts, max(value) AS value
             |  FROM events GROUP BY user_id, ts),
             |b AS (
             |  SELECT CAST(CAST(min(ts) AS DATE) AS TIMESTAMP) AS t0,
             |         CAST(CAST(max(ts) AS DATE) AS TIMESTAMP) AS t1
             |  FROM events),
             |u AS (SELECT DISTINCT user_id FROM events),
             |g AS (
             |  SELECT u.user_id, b.t0 + i * INTERVAL 1 DAY AS grid_ts
             |  FROM u, b, range(0, 100000) AS t(i)
             |  WHERE b.t0 + i * INTERVAL 1 DAY <= b.t1)
             |SELECT g.user_id, g.grid_ts, e.ts AS asof_ts,
             |  e.value AS asof_value
             |FROM g ASOF LEFT JOIN ev e
             |  ON g.user_id = e.user_id AND g.grid_ts >= e.ts
             |ORDER BY g.user_id ASC NULLS FIRST, g.grid_ts ASC""".stripMargin)),

    Gate("w6_ordinals", (s, d) =>
      graft.operators.Ordinals.withGlobalOrdinal(t(s, d, "events"),
        "ordinal", Seq(col("ts").asc, col("event_id").asc))
        .select("ordinal", "event_id", "event_type")
        .orderBy(col("ordinal")),
      Some("""SELECT ROW_NUMBER() OVER (ORDER BY ts, event_id) AS ordinal,
             |  event_id, event_type
             |FROM events ORDER BY ordinal ASC NULLS FIRST""".stripMargin)),

    // A7 `k-means (n) -> (reduction)` (snippets:93-100; reference uses
    // Accord.MachineLearning). operators.KMeansDet: deterministic Lloyd —
    // quantile init, fixed iterations, exact-decimal centroid means,
    // canonical (centroid-sorted) ids — so the WHOLE clustering unrolls
    // into a DuckDB oracle and the gate is a full hash check, not the
    // rows-only it was for three rounds.
    Gate("a7_kmeans", (s, d) => {
      val ev = t(s, d, "events")
        .select(col("event_id"), col("user_id").cast(DoubleType).as("f1"),
          col("value").as("f2"))
      // null-feature rows are dropped BEFORE labeling (plain IsNotNull
      // pushes to the scan; filtering on `cluster` instead would make
      // Catalyst evaluate the whole assignment CASE twice per row)
      graft.operators.KMeansDet.withCluster(
        ev.filter(col("f1").isNotNull && col("f2").isNotNull &&
          !isnan(col("f2"))),
        Seq("f1", "f2"), Seq(col("event_id")), k = 4, iters = 10)
        .groupBy(col("cluster"))
        .agg(count(lit(1)).as("n"), davg(col("f2")).as("mean_value"))
        .orderBy(col("cluster"))
    },
      // the source relation pre-filters usable rows exactly like the
      // Spark side above — __km's null-cluster parity rows (unusable
      // features) must not reappear here as a spurious NULL group
      Some(s"""WITH ${graft.operators.KMeansDet.oracleSql(
        "(SELECT event_id, CAST(user_id AS DOUBLE) AS f1, value AS f2 FROM events" +
          " WHERE user_id IS NOT NULL AND value IS NOT NULL AND NOT isnan(value))",
        Seq("event_id"), Seq("f1", "f2"), k = 4, iters = 10)}
             |SELECT cluster, COUNT(*) AS n,
             |  ${davgSql("f2")} AS mean_value
             |FROM __km GROUP BY cluster
             |ORDER BY cluster ASC NULLS FIRST""".stripMargin))
  )
}
