package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Gate.t
import Det._

/** Projection / filter / aggregation / join / set-op gates.
  *
  * Each gate mirrors one operator row of SURVEY.md §2 (P*, A*, J*, U*, E*),
  * expressed over the driver's TPC-H-ish tables. Every query ends in a
  * deterministic ORDER BY (unique tie-break) and every computed column is
  * aliased identically in the Spark plan and the DuckDB oracle.
  */
object CoreGates {

  val gates: Seq[Gate] = Seq(

    // P1 `create column` — per-row expression column (hobbes snippets:3-10).
    Gate("p1_create_column",
      (s, d) => t(s, d, "lineitem")
        .withColumn("revenue", col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .select("l_orderkey", "l_linenumber", "revenue")
        .orderBy(col("l_orderkey"), col("l_linenumber")),
      Some("""SELECT l_orderkey, l_linenumber,
             |  l_extendedprice * (1.0 - l_discount) AS revenue
             |FROM lineitem
             |ORDER BY l_orderkey ASC NULLS FIRST, l_linenumber ASC NULLS FIRST""".stripMargin)),

    // P2 `rename column` + P3 `slice columns` (snippets:11-18, 27-34).
    Gate("p2_rename_slice",
      (s, d) => t(s, d, "lineitem")
        .withColumnRenamed("l_quantity", "qty")
        .select("l_orderkey", "l_linenumber", "qty")
        .orderBy(col("l_orderkey"), col("l_linenumber")),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity AS qty
             |FROM lineitem
             |ORDER BY l_orderkey ASC NULLS FIRST, l_linenumber ASC NULLS FIRST""".stripMargin)),

    // P4 `only <boolExp>` — predicate row filter (snippets:76-83).
    Gate("p4_only_filter",
      (s, d) => t(s, d, "lineitem")
        .filter(col("l_returnflag") === "R" &&
          col("l_shipdate") < to_timestamp(lit("1998-01-01")))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
        .orderBy(col("l_orderkey"), col("l_linenumber")),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
             |FROM lineitem
             |WHERE l_returnflag = 'R' AND l_shipdate < TIMESTAMP '1998-01-01'
             |ORDER BY l_orderkey ASC NULLS FIRST, l_linenumber ASC NULLS FIRST""".stripMargin)),

    // P5 `dense rows` — keep rows where most columns are non-missing
    // (snippets:44-51; threshold >=50% per SURVEY §7.4.5). The TPC-H data
    // is null-free, so nulls are derived with NULLIF first.
    Gate("p5_dense_rows", (s, d) => {
      val o = t(s, d, "orders")
        .withColumn("st", nullif(col("o_orderstatus"), lit("P")))
        .withColumn("pri", nullif(col("o_orderpriority"), lit("1-URGENT")))
        .withColumn("tp", when(col("o_totalprice") < 1000.0, lit(null)
          .cast(DoubleType)).otherwise(col("o_totalprice")))
        .select("o_orderkey", "st", "pri", "tp")
      val nonNull = Seq("st", "pri", "tp")
        .map(c => when(col(c).isNotNull, 1).otherwise(0))
        .reduce(_ + _)
      o.filter(nonNull >= 2).orderBy(col("o_orderkey"))
    },
      Some("""SELECT * FROM (
             |  SELECT o_orderkey,
             |    NULLIF(o_orderstatus, 'P') AS st,
             |    NULLIF(o_orderpriority, '1-URGENT') AS pri,
             |    CASE WHEN o_totalprice < 1000.0 THEN NULL ELSE o_totalprice END AS tp
             |  FROM orders)
             |WHERE (CASE WHEN st IS NOT NULL THEN 1 ELSE 0 END
             |     + CASE WHEN pri IS NOT NULL THEN 1 ELSE 0 END
             |     + CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END) >= 2
             |ORDER BY o_orderkey ASC NULLS FIRST""".stripMargin)),

    // P6 `dense columns` — keep columns where most rows are non-missing
    // (snippets:36-43). `pri` below is 100% null at every sf, so the
    // surviving column set is stable; the Spark side decides dynamically.
    Gate("p6_dense_columns", (s, d) => {
      val o = t(s, d, "orders")
        .withColumn("pri", nullif(col("o_orderpriority"), col("o_orderpriority")))
        .select("o_orderkey", "o_orderstatus", "o_totalprice", "pri")
      val total = o.count()
      val counts = o.select(o.columns.map(c =>
        count(col(c)).as(c)).toSeq: _*).head()
      val keep = o.columns.zipWithIndex
        .filter { case (_, i) => counts.getLong(i) * 2 >= total }
        .map(_._1)
      o.select(keep.map(col).toSeq: _*).orderBy(col("o_orderkey"))
    },
      Some("""SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
             |ORDER BY o_orderkey ASC NULLS FIRST""".stripMargin)),

    // P7 `numeric columns` — schema-driven projection (snippets:52-59).
    Gate("p7_numeric_columns", (s, d) => {
      val li = t(s, d, "lineitem")
      val numeric = li.schema.fields
        .filter(_.dataType.isInstanceOf[NumericType]).map(_.name)
      li.select(numeric.map(col).toSeq: _*)
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },
      Some("""SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
             |  l_quantity, l_extendedprice, l_discount, l_tax
             |FROM lineitem
             |ORDER BY l_orderkey ASC NULLS FIRST, l_linenumber ASC NULLS FIRST""".stripMargin)),

    // P9 `sort by column` (snippets:68-75) — total order, unique tie-break.
    Gate("p9_sort_by",
      (s, d) => t(s, d, "orders")
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
        .orderBy(col("o_totalprice").desc, col("o_orderkey")),
      Some("""SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
             |ORDER BY o_totalprice DESC NULLS LAST, o_orderkey ASC NULLS FIRST""".stripMargin)),

    // A1 `group by -> sum` — one reduction over every remaining numeric
    // column, hobbes-style (snippets:109-116; MTTR.hb:24).
    Gate("a1_group_sum",
      (s, d) => t(s, d, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_price"),
          dsum(col("l_discount")).as("sum_disc"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag"), col("l_linestatus")),
      Some(s"""SELECT l_returnflag, l_linestatus,
             |  ${dsumSql("l_quantity")} AS sum_qty,
             |  ${dsumSql("l_extendedprice")} AS sum_price,
             |  ${dsumSql("l_discount")} AS sum_disc,
             |  COUNT(*) AS n_rows
             |FROM lineitem GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)),

    // A2 `group by -> maxby` — per group keep the row maximizing an
    // expression (snippets:117-124; Velocity.hb:22). Deterministic
    // tie-break on l_linenumber.
    Gate("a2_group_maxby", (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("l_orderkey"))
        .orderBy(col("l_shipdate").desc, col("l_linenumber").desc,
          col("l_quantity").desc)
      t(s, d, "lineitem")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("l_orderkey", "l_linenumber", "l_shipdate", "l_quantity")
        .orderBy(col("l_orderkey"))
    },
      Some("""SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity FROM (
             |  SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity,
             |    ROW_NUMBER() OVER (PARTITION BY l_orderkey
             |      ORDER BY l_shipdate DESC, l_linenumber DESC, l_quantity DESC) AS rn
             |  FROM lineitem)
             |WHERE rn = 1 ORDER BY l_orderkey ASC NULLS FIRST""".stripMargin)),

    // A3 `group by -> minby` (snippets:125-132).
    Gate("a3_group_minby", (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("l_orderkey"))
        .orderBy(col("l_shipdate").asc, col("l_linenumber").asc,
          col("l_quantity").asc)
      t(s, d, "lineitem")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("l_orderkey", "l_linenumber", "l_shipdate", "l_quantity")
        .orderBy(col("l_orderkey"))
    },
      Some("""SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity FROM (
             |  SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity,
             |    ROW_NUMBER() OVER (PARTITION BY l_orderkey
             |      ORDER BY l_shipdate ASC, l_linenumber ASC, l_quantity ASC) AS rn
             |  FROM lineitem)
             |WHERE rn = 1 ORDER BY l_orderkey ASC NULLS FIRST""".stripMargin)),

    // A4 — the full reduction vocabulary: count, distinct, max, mean,
    // median, min, stddev, sum, variance (hobbes.YAML-tmLanguage:13-14).
    Gate("a4_reductions",
      (s, d) => t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("cnt"),
          countDistinct(col("l_partkey")).as("ndis"),
          max(col("l_quantity")).as("max_qty"),
          davg(col("l_quantity")).as("mean_qty"),
          median(col("l_quantity")).as("med_qty"),
          min(col("l_quantity")).as("min_qty"),
          dstddev(col("l_quantity")).as("sd_qty"),
          dsum(col("l_quantity")).as("sum_qty"),
          dvar(col("l_quantity")).as("var_qty"))
        .orderBy(col("l_returnflag")),
      Some(s"""SELECT l_returnflag,
             |  COUNT(*) AS cnt,
             |  COUNT(DISTINCT l_partkey) AS ndis,
             |  MAX(l_quantity) AS max_qty,
             |  ${davgSql("l_quantity")} AS mean_qty,
             |  MEDIAN(l_quantity) AS med_qty,
             |  MIN(l_quantity) AS min_qty,
             |  ${dstddevSql("l_quantity")} AS sd_qty,
             |  ${dsumSql("l_quantity")} AS sum_qty,
             |  ${dvarSql("l_quantity")} AS var_qty
             |FROM lineitem GROUP BY l_returnflag
             |ORDER BY l_returnflag ASC NULLS FIRST""".stripMargin)),

    // A5 `pivot` — dynamic columns from colExp values (snippets:19-26;
    // Velocity.hb:28). l_linestatus ∈ {F, O} at every sf.
    Gate("a5_pivot",
      (s, d) => t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(dsum(col("l_quantity")))
        .orderBy(col("l_returnflag")),
      Some(s"""SELECT l_returnflag,
             |  ${dsumSql("CASE WHEN l_linestatus = 'F' THEN l_quantity END")} AS F,
             |  ${dsumSql("CASE WHEN l_linestatus = 'O' THEN l_quantity END")} AS O
             |FROM lineitem GROUP BY l_returnflag
             |ORDER BY l_returnflag ASC NULLS FIRST""".stripMargin)),

    // A6 `buckets (n) -> (reduction)` — equal-count buckets (snippets:85-92).
    // Scale-safe: range-partitioned NTILE (operators.Ordinals), not a
    // single-partition global window.
    Gate("a6_buckets", (s, d) => {
      t(s, d, "lineitem")
        .transform(df => graft.operators.Ordinals.withGlobalNtile(df,
          "bucket", 8, Seq(col("l_orderkey").asc, col("l_linenumber").asc)))
        .groupBy(col("bucket"))
        .agg(dsum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("bucket"))
    },
      Some(s"""SELECT bucket, ${dsumSql("l_quantity")} AS sum_qty,
             |  COUNT(*) AS n_rows
             |FROM (
             |  SELECT l_quantity, CAST(NTILE(8) OVER
             |    (ORDER BY l_orderkey, l_linenumber) AS INTEGER) AS bucket
             |  FROM lineitem)
             |GROUP BY bucket ORDER BY bucket ASC NULLS FIRST""".stripMargin)),

    // A8 `each <reduction>` — reduction across the numeric cells of each
    // row (snippets:101-108), via the `aggregate` higher-order function.
    Gate("a8_each_mean",
      (s, d) => t(s, d, "lineitem")
        .withColumn("row_mean",
          aggregate(
            array(col("l_quantity"), col("l_extendedprice"),
              col("l_discount"), col("l_tax")),
            lit(0.0), (acc, x) => acc + x) / lit(4))
        .select("l_orderkey", "l_linenumber", "row_mean")
        .orderBy(col("l_orderkey"), col("l_linenumber")),
      Some("""SELECT l_orderkey, l_linenumber,
             |  (0.0 + l_quantity + l_extendedprice + l_discount + l_tax) / 4 AS row_mean
             |FROM lineitem
             |ORDER BY l_orderkey ASC NULLS FIRST, l_linenumber ASC NULLS FIRST""".stripMargin)),

    // J1 source-level join — outer join on the indexed field
    // (Broker.fs:87-93; Deedle default = outer index join).
    Gate("j1_join_outer", (s, d) => {
      val o = t(s, d, "orders")
      val c = t(s, d, "customer")
      o.join(c, o("o_custkey") === c("c_custkey"), "full_outer")
        .select(
          coalesce(col("o_custkey"), col("c_custkey")).as("custkey"),
          col("o_orderkey"), col("o_totalprice"), col("c_name"),
          col("c_acctbal"))
        .orderBy(col("custkey"), col("o_orderkey"))
    },
      Some("""SELECT COALESCE(o_custkey, c_custkey) AS custkey,
             |  o_orderkey, o_totalprice, c_name, c_acctbal
             |FROM orders FULL OUTER JOIN customer ON o_custkey = c_custkey
             |ORDER BY custkey ASC NULLS FIRST, o_orderkey ASC NULLS FIRST""".stripMargin)),

    // J1b — the common equi-join + aggregate shape, with an explicit
    // broadcast of the small dimension (scale design: part is the dim).
    Gate("j1_join_broadcast_agg", (s, d) => {
      val li = t(s, d, "lineitem")
      val p = t(s, d, "part")
      li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("p_brand"))
    },
      Some(s"""SELECT p_brand,
             |  ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue,
             |  COUNT(*) AS n_items
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |GROUP BY p_brand ORDER BY p_brand ASC NULLS FIRST""".stripMargin)),

    // U1 `Merge` — union-by-name tolerating missing columns
    // (Broker.fs:81-85; Processer.fs:17-22).
    Gate("u1_merge_union", (s, d) => {
      val a = t(s, d, "orders").filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey").as("k"), col("o_totalprice").as("price"))
      val b = t(s, d, "orders").filter(col("o_orderstatus") === "O")
        .select(col("o_orderkey").as("k"),
          col("o_orderpriority").as("priority"))
      a.unionByName(b, allowMissingColumns = true)
        .orderBy(col("k"))
    },
      Some("""SELECT * FROM (
             |  SELECT o_orderkey AS k, o_totalprice AS price
             |  FROM orders WHERE o_orderstatus = 'F'
             |  UNION ALL BY NAME
             |  SELECT o_orderkey AS k, o_orderpriority AS priority
             |  FROM orders WHERE o_orderstatus = 'O')
             |ORDER BY k ASC NULLS FIRST""".stripMargin)),

    // E3 `if {x} else {y}` — nested conditionals (snippets:142-149;
    // logic.hb:18).
    Gate("e3_if_else",
      (s, d) => t(s, d, "orders")
        .withColumn("size_class",
          when(col("o_totalprice") > 200000.0, lit("large"))
            .otherwise(when(col("o_totalprice") > 50000.0, lit("medium"))
              .otherwise(lit("small"))))
        .select("o_orderkey", "o_totalprice", "size_class")
        .orderBy(col("o_orderkey")),
      Some("""SELECT o_orderkey, o_totalprice,
             |  CASE WHEN o_totalprice > 200000.0 THEN 'large'
             |       ELSE CASE WHEN o_totalprice > 50000.0 THEN 'medium'
             |            ELSE 'small' END END AS size_class
             |FROM orders ORDER BY o_orderkey ASC NULLS FIRST""".stripMargin)),

    // E4 `contains` — membership test (transformations.fsx:110-126).
    Gate("e4_contains",
      (s, d) => t(s, d, "orders")
        .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .orderBy(col("o_orderpriority")),
      Some(s"""SELECT o_orderpriority, COUNT(*) AS n,
             |  ${dsumSql("o_totalprice")} AS total
             |FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
             |GROUP BY o_orderpriority
             |ORDER BY o_orderpriority ASC NULLS FIRST""".stripMargin)),

    // E5 `missing` / isMissing / isntMissing (snippets:174-181).
    Gate("e5_missing",
      (s, d) => t(s, d, "orders")
        .withColumn("st", nullif(col("o_orderstatus"), lit("P")))
        .filter(col("st").isNotNull)
        .groupBy(col("st")).agg(count(lit(1)).as("n"))
        .orderBy(col("st")),
      Some("""SELECT st, COUNT(*) AS n FROM (
             |  SELECT NULLIF(o_orderstatus, 'P') AS st FROM orders)
             |WHERE st IS NOT NULL GROUP BY st
             |ORDER BY st ASC NULLS FIRST""".stripMargin)),

    // E6 `int (exp)` — integral conversion (snippets:150-157). Both sides
    // use FLOOR to avoid the Spark-truncates / DuckDB-rounds divergence.
    Gate("e6_int_cast",
      (s, d) => t(s, d, "orders")
        .withColumn("price_int", floor(col("o_totalprice")).cast(IntegerType))
        .select("o_orderkey", "price_int")
        .orderBy(col("o_orderkey")),
      Some("""SELECT o_orderkey,
             |  CAST(FLOOR(o_totalprice) AS INTEGER) AS price_int
             |FROM orders ORDER BY o_orderkey ASC NULLS FIRST""".stripMargin)),

    // E7 `regex` group-token extraction (snippets:158-165; Velocity.hb:24).
    Gate("e7_regex",
      (s, d) => t(s, d, "part")
        .withColumn("first_word", regexp_extract(col("p_name"), "^(\\w+)", 1))
        .withColumn("tagged", concat(lit("w:"), col("first_word")))
        .select("p_partkey", "first_word", "tagged")
        .orderBy(col("p_partkey")),
      Some("""SELECT p_partkey,
             |  regexp_extract(p_name, '^(\w+)', 1) AS first_word,
             |  'w:' || regexp_extract(p_name, '^(\w+)', 1) AS tagged
             |FROM part ORDER BY p_partkey ASC NULLS FIRST""".stripMargin)),

    // E9 `format date` — date-part vocabulary: date, day, week, weekday,
    // month, year (snippets:134-141). DuckDB dayofweek is 0-based; +1
    // aligns it with Spark's 1=Sunday convention.
    Gate("e9_date_parts",
      (s, d) => t(s, d, "orders")
        .select(col("o_orderkey"),
          to_date(col("o_orderdate")).as("d_date"),
          dayofmonth(col("o_orderdate")).as("d_day"),
          weekofyear(col("o_orderdate")).as("d_week"),
          dayofweek(col("o_orderdate")).as("d_weekday"),
          month(col("o_orderdate")).as("d_month"),
          year(col("o_orderdate")).as("d_year"))
        .orderBy(col("o_orderkey")),
      Some("""SELECT o_orderkey,
             |  CAST(o_orderdate AS DATE) AS d_date,
             |  CAST(DAY(o_orderdate) AS INTEGER) AS d_day,
             |  CAST(WEEKOFYEAR(o_orderdate) AS INTEGER) AS d_week,
             |  CAST(DAYOFWEEK(o_orderdate) + 1 AS INTEGER) AS d_weekday,
             |  CAST(MONTH(o_orderdate) AS INTEGER) AS d_month,
             |  CAST(YEAR(o_orderdate) AS INTEGER) AS d_year
             |FROM orders ORDER BY o_orderkey ASC NULLS FIRST""".stripMargin))
  )
}
