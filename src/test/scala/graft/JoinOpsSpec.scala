package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import graft.operators.{AsofJoin, RangeJoin, SkewJoin}
import graft.sources.Ingest

/** As-of / range / salted-skew joins: value semantics against small
  * hand-computed fixtures, and the plan-shape guarantees that ARE the
  * operators' reason to exist (no nested-loop join, bounded shuffles).
  * Engine-vs-DuckDB parity is pinned by the j2/j3/j4 gates. */
class JoinOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Sessions.local()

  private def noNestedLoop(df: org.apache.spark.sql.DataFrame): Unit = {
    val p = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    val bad = p.collect {
      case b: BroadcastNestedLoopJoinExec => b
      case c: CartesianProductExec => c
    }
    assert(bad.isEmpty, s"nested-loop join in plan:\n$p")
  }

  // --------------------------------------------------------------- as-of

  private def quotes = Ingest.localData(spark, Seq("k", "t", "px"),
    Seq(Seq("a", 10L, 1.0), Seq("a", 20L, 2.0), Seq("a", 30L, 3.0),
      Seq("b", 15L, 9.0)))

  test("asof backward: greatest right time <= left time, per key, " +
    "inclusive; unmatched stays null") {
    val trades = Ingest.localData(spark, Seq("k", "t"),
      Seq(Seq("a", 5L), Seq("a", 20L), Seq("a", 25L), Seq("a", 99L),
        Seq("b", 14L), Seq("c", 50L)))
    val out = AsofJoin.backward(trades, quotes, "t", "t",
      Seq("k"), Seq("k"), Seq("px"))
      .orderBy("k", "t").collect()
      .map(r => (r.getString(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Double])))
    assert(out.toSeq == Seq(
      ("a", 5L, None, None),            // before first quote
      ("a", 20L, Some(20L), Some(2.0)), // equal ts is eligible
      ("a", 25L, Some(20L), Some(2.0)),
      ("a", 99L, Some(30L), Some(3.0)),
      ("b", 14L, None, None),           // key isolation: a@10 invisible
      ("c", 50L, None, None)))          // key with no quotes at all
  }

  test("asof forward mirrors backward; tolerance nulls out stale matches") {
    val trades = Ingest.localData(spark, Seq("k", "t"),
      Seq(Seq("a", 5L), Seq("a", 20L), Seq("a", 31L)))
    val fwd = AsofJoin.forward(trades, quotes, "t", "t",
      Seq("k"), Seq("k"), Seq("px"))
      .orderBy("t").collect()
      .map(r => Option(r.get(3)).map(_.asInstanceOf[Double]))
    assert(fwd.toSeq == Seq(Some(1.0), Some(2.0), None))
    val tol = AsofJoin.backward(trades, quotes, "t", "t",
      Seq("k"), Seq("k"), Seq("px"), tolerance = Some(lit(5L)))
      .orderBy("t").collect()
      .map(r => Option(r.get(3)).map(_.asInstanceOf[Double]))
    // t=31 matches quote@30 (age 1 <= 5); t=5/20: age 0 and age 0
    assert(tol.toSeq == Seq(None, Some(2.0), Some(3.0)))
  }

  test("asof: a whole right row wins — a NULL value column must not " +
    "splice in an older row's value") {
    val right = Ingest.localData(spark, Seq("k", "t", "px"),
      Seq(Seq("a", 10L, 7.0)))
      .union(Ingest.localData(spark, Seq("k", "t"), Seq(Seq("a", 20L)))
        .withColumn("px", lit(null).cast("double")))
    val trades = Ingest.localData(spark, Seq("k", "t"), Seq(Seq("a", 25L)))
    val out = AsofJoin.backward(trades, right, "t", "t",
      Seq("k"), Seq("k"), Seq("px")).collect().head
    // the matched row is t=20 whose px IS null — not t=10's 7.0
    assert(out.getLong(2) == 20L)
    assert(out.isNullAt(3))
  }

  test("asof: a right row with NULL time matches nothing — it must not " +
    "become the nulls-first fallback match") {
    val right = Ingest.localData(spark, Seq("k", "px"), Seq(Seq("a", 9.0)))
      .withColumn("t", lit(null).cast("bigint"))
      .select("k", "t", "px")
    val trades = Ingest.localData(spark, Seq("k", "t"), Seq(Seq("a", 5L)))
    val out = AsofJoin.backward(trades, right, "t", "t",
      Seq("k"), Seq("k"), Seq("px")).collect().head
    assert(out.isNullAt(2) && out.isNullAt(3))
  }

  test("asof: NULL left key or NULL left time matches nothing " +
    "(SQL comparison parity)") {
    val trades = Ingest.localData(spark, Seq("k", "t"), Seq(Seq("a", 25L)))
      .union(Ingest.localData(spark, Seq("k", "t"), Seq(Seq("a", 26L)))
        .withColumn("k", lit(null).cast("string")))
      .union(Ingest.localData(spark, Seq("k", "t"), Seq(Seq("a", 27L)))
        .withColumn("t", lit(null).cast("bigint")))
    val out = AsofJoin.backward(trades, quotes, "t", "t",
      Seq("k"), Seq("k"), Seq("px"))
      .collect().map(r => Option(r.get(3)))
    assert(out.count(_.isDefined) == 1) // only the (a, 25) row matches
  }

  test("asof plan: one keyed shuffle, no nested loop") {
    val trades = Ingest.localData(spark, Seq("k", "t"),
      (0 until 100).map(i => Seq(("k" + i % 3), i.toLong)))
    val out = AsofJoin.backward(trades, quotes, "t", "t",
      Seq("k"), Seq("k"), Seq("px"))
    noNestedLoop(out)
    assert(PlanChecks.shuffles(out).size == 1,
      out.queryExecution.executedPlan.toString)
  }

  // --------------------------------------------------------------- range

  test("range join: inclusive bounds, each qualifying pair exactly once " +
    "across bin boundaries, inverted/null intervals match nothing") {
    val pts = Ingest.localData(spark, Seq("k", "p"),
      Seq(Seq("u", 0L), Seq("u", 10L), Seq("u", 25L), Seq("u", 99L),
        Seq("v", 10L)))
    val ivals = Ingest.localData(spark, Seq("k", "iid", "s", "e"),
      Seq(Seq("u", 1L, 5L, 25L),    // spans 3 bins at width 10
        Seq("u", 2L, 10L, 10L),     // degenerate single-point interval
        Seq("u", 3L, 30L, 20L),     // inverted: matches nothing
        Seq("v", 4L, 0L, 99L)))
      .union(Ingest.localData(spark, Seq("k", "iid", "s"),
        Seq(Seq("u", 5L, 0L))).withColumn("e", lit(null).cast("bigint")))
    val out = RangeJoin.binned(pts, ivals, "p", "s", "e",
      Seq("k"), Seq("k"), binWidth = 10L)
      .select("iid", "p").orderBy("iid", "p").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 10L), (1L, 25L), (2L, 10L), (4L, 10L)))
  }

  test("range join plan: equi-join on (key, bin), no nested loop") {
    val pts = Ingest.localData(spark, Seq("k", "p"),
      (0 until 200).map(i => Seq("k" + i % 5, i.toLong)))
    val ivals = Ingest.localData(spark, Seq("k", "iid", "s", "e"),
      (0 until 40).map(i => Seq("k" + i % 5, i.toLong, i * 3L, i * 3L + 20)))
    val out = RangeJoin.binned(pts, ivals, "p", "s", "e",
      Seq("k"), Seq("k"), binWidth = 16L)
    noNestedLoop(out)
  }

  test("range join: shared-lineage sides join cleanly — no trivially-" +
    "true predicate repair (the sides are plan-qualified aliases)") {
    // points and intervals derived from the SAME frame: before the
    // alias fix, `pts(k) === ivals(k)` carried identical attribute ids
    // and only worked because Spark's dataset-id disambiguation
    // repaired the condition (logging a WARN from sql.Column) — a
    // repair that is fragile across Spark upgrades. Capture that
    // logger: the build must emit NO such warning.
    import org.apache.logging.log4j.LogManager
    import org.apache.logging.log4j.core.LogEvent
    import org.apache.logging.log4j.core.appender.AbstractAppender
    val captured = scala.collection.mutable.Buffer[String]()
    val app = new AbstractAppender("graft-capture", null, null, false,
      Array.empty[org.apache.logging.log4j.core.config.Property]) {
      override def append(e: LogEvent): Unit =
        captured.synchronized {
          captured += e.getMessage.getFormattedMessage
        }
    }
    app.start()
    val logger = LogManager.getLogger("org.apache.spark.sql.Column")
      .asInstanceOf[org.apache.logging.log4j.core.Logger]
    logger.addAppender(app)
    try {
      val base = Ingest.localData(spark, Seq("k", "t"),
        (0 until 50).map(i => Seq("k" + i % 3, i.toLong)))
      val ivals = base.select(col("k"), col("t").as("s"),
        (col("t") + 5L).as("e"))
      val out = RangeJoin.binned(base, ivals, "t", "s", "e",
        Seq("k"), Seq("k"), binWidth = 8L)
      assert(out.count() > 0)
      val bad = captured.synchronized {
        captured.filter(_.contains("trivially true"))
      }
      assert(bad.isEmpty, s"trivially-true repair triggered: $bad")
    } finally {
      logger.removeAppender(app)
      app.stop()
    }
  }

  test("range join: negative coordinates bin correctly (floor, not " +
    "truncate-toward-zero)") {
    val pts = Ingest.localData(spark, Seq("p"), Seq(Seq(-5L), Seq(-15L)))
    val ivals = Ingest.localData(spark, Seq("iid", "s", "e"),
      Seq(Seq(1L, -10L, -1L)))
    val out = RangeJoin.binned(pts, ivals, "p", "s", "e",
      Nil, Nil, binWidth = 10L).select("iid", "p").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq
      == Seq((1L, -5L)))
  }

  // --------------------------------------------------------------- salted

  test("salted join equals the plain join, row for row, including " +
    "duplicate dim keys") {
    // Seq[Any] pins element types: a bare Seq(1L, 2L, 3.0) numeric-widens
    // every element to Double and the ids stop being longs
    val fact = Ingest.localData(spark, Seq("id", "fk", "v"),
      (0 until 200).map(i => Seq[Any](i.toLong, (i % 7).toLong, i.toDouble)))
    // dim with a duplicated key: salting must not double-count
    val dim = Ingest.localData(spark, Seq("dk", "name"),
      (0 until 7).map(i => Seq(i.toLong, "d" + i)) :+ Seq(3L, "d3bis"))
    val salted = SkewJoin.salted(fact, dim, "fk", "dk", 8, col("id"))
      .select("id", "name").orderBy("id", "name")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val plain = fact.join(dim, fact("fk") === dim("dk"))
      .select("id", "name").orderBy("id", "name")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(salted == plain)
    assert(salted.size == 200 + fact.filter(col("fk") === 3).count().toInt)
  }

  test("salted join spreads a hot key across salt partitions") {
    val fact = Ingest.localData(spark, Seq("id", "fk"),
      (0 until 256).map(i => Seq(i.toLong, 1L))) // every row the same key
    val dim = Ingest.localData(spark, Seq("dk", "name"),
      Seq(Seq(1L, "hot")))
    val salts = 8
    // distinct derived salt values: the hot key's rows must actually
    // fan out over [0, salts) — the whole point of the operator
    val n = fact.select(
      pmod(xxhash64(col("id")), lit(salts.toLong)).as("s"))
      .distinct().count()
    assert(n == salts)
    assert(SkewJoin.salted(fact, dim, "fk", "dk", salts, col("id"))
      .count() == 256)
  }
}
