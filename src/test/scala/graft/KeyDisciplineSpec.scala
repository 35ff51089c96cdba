package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.hb.{Ast, Engine, Graft, HbParser}
import graft.sources.Ingest

/** SURVEY §7.4.2: the `__key` index is invisible but load-bearing. Every
  * statement must (a) keep `__key` out of user-visible output, (b) leave
  * `keys` usable afterwards, and the engine must behave sanely on dirty
  * input (nulls, heterogeneous values, division by zero, bad casts). */
class KeyDisciplineSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Sessions.local()

  private def fixture = Ingest.localData(spark,
    Seq("g", "v", "s"),
    Seq(Seq[Any]("a", 1.0, "x"), Seq[Any]("a", 2.0, "y"),
      Seq[Any]("b", 3.0, null), Seq[Any](null, 4.0, "z")))

  private val statements = Seq(
    "create column w (v * 2)",
    "rename column s t",
    "slice columns g v",
    "only (v > 1)",
    "dense rows",
    "dense columns",
    "numeric columns",
    "index rows by v",
    "sort by column v",
    "group by g -> sum",
    "group by g -> maxby v",
    "pivot [g] [s] -> count [v]",
    "buckets (2) -> (sum)",
    "each mean",
    "create column f (linear extrapolation [v] 2 2)")

  test("no statement leaks __key; `keys` still works after each") {
    statements.foreach { text =>
      val st = HbParser.parseStatement(text)
      val frame = Engine.applyStatement(Engine.fromSource(fixture), st)
      assert(!frame.result.columns.contains(Engine.KEY),
        s"__key leaked after: $text")
      // keys must compile and evaluate after every statement
      val withKeys = Engine.applyStatement(frame,
        HbParser.parseStatement("create column theKey keys"))
      assert(withKeys.result.columns.contains("theKey"), s"after: $text")
      withKeys.df.collect() // must not throw
    }
  }

  test("dirty data: comparisons with nulls drop rows, no crash") {
    val out = Graft.runHb("only (g = 'a')", fixture)
    assert(out.count() == 2) // null g row dropped, not crashed
  }

  test("strict int(): a non-convertible value fails the transformation " +
    "(reference semantics), convertible values pass") {
    val bad = Ingest.localData(spark, Seq("s"),
      Seq(Seq("12"), Seq("nope"), Seq("7")))
    val ex = intercept[Exception] {
      Graft.runHb("create column n (int (s))", bad).collect()
    }
    assert(ex.getMessage.contains("int()") ||
      Option(ex.getCause).exists(_.getMessage.contains("int()")))
    val good = Ingest.localData(spark, Seq("s"),
      Seq(Seq("12"), Seq("7")))
    val out = Graft.runHb("create column n (int (s))", good)
    assert(out.select("n").collect().map(_.getInt(0)).sorted.toSeq ==
      Seq(7, 12))
    // a null input stays missing (nulls are not failures), strippable
    val withNull = Ingest.localData(spark, Seq("s"),
      Seq(Seq("12"), Seq(null)))
    val stripped = Graft.runHb(
      """create column n (int (s))
        |only !(n = missing)""".stripMargin, withNull)
    assert(stripped.count() == 1)
  }

  test("dirty data: division by zero yields null not crash") {
    val df = Ingest.localData(spark, Seq("a", "b"),
      Seq(Seq(1.0, 0.0), Seq(4.0, 2.0)))
    val out = Graft.runHb(
      """create column q (a / b)
        |only !(q = missing)""".stripMargin, df)
    assert(out.count() >= 1)
  }

  test("statement on missing column fails with an analysis error, " +
    "except tolerant slice/rename") {
    intercept[Exception] {
      Graft.runHb("only (nosuch = 1)", fixture).collect()
    }
    assert(Graft.runHb("slice columns nosuch g", fixture)
      .columns.toSeq == Seq("g"))
    assert(Graft.runHb("rename column nosuch x", fixture)
      .columns.toSeq == fixture.columns.toSeq)
  }
}
