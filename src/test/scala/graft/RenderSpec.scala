package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.hb.{Graft, HbParser, Render}
import graft.sources.Ingest

/** Literate rendering: `!#…!#` blocks become prose, statement runs become
  * `.hb` code blocks (via Printer, so they re-parse), results render as a
  * bounded HTML table — the visualizer's Comment-branch behavior. */
class RenderSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Sessions.local()

  test("prose, code, and result table interleave; HTML is escaped") {
    val prog = HbParser.parse(
      """!#Counts by <kind> & friends.
        |
        |Second paragraph.!#
        |create column b (a * 2)
        |only (b > 2)
        |!#Tail note!#
        |""".stripMargin)
    val df = Ingest.localData(spark, Seq("a"), Seq(Seq(1.0), Seq(2.0)))
    val out = Render.html(prog, Some(Graft.run(prog, df)))
    assert(out.contains("<p>Counts by &lt;kind&gt; &amp; friends.</p>"))
    assert(out.contains("<p>Second paragraph.</p>"))
    assert(out.contains("<pre><code>create column b ((a * 2))"))
    assert(out.contains("<p>Tail note</p>"))
    assert(out.contains("<th>a</th>") && out.contains("<th>b</th>"))
    assert(out.contains("<td>4.0</td>")) // only the b>2 row survives
    assert(!out.contains("<td>1.0</td>"))
    // prose stays out of code blocks and code stays valid .hb
    val code = out.split("<pre><code>")(1).split("</code></pre>")(0)
      .replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&amp;", "&")
    HbParser.parse(code)
  }

  test("maxRows bounds the table") {
    val df = Ingest.localData(spark, Seq("a"),
      (1 to 50).map(i => Seq[Any](i.toDouble)))
    val out = Render.table(df, maxRows = 7)
    assert(out.split("<tr>").length - 2 == 7) // header row + 7 data rows
  }

  /** 3-state work-item fixture (the EngineSpec Velocity shape). */
  private def workitems = Ingest.localData(spark,
    Seq("Sprint", "Item", "State", "Points", "Changed"),
    Seq(
      Seq("S1", 1L, "Done", 3.0, "2020-01-05"),
      Seq("S1", 1L, "Doing", 3.0, "2020-01-02"),
      Seq("S1", 2L, "Done", 5.0, "2020-01-03"),
      Seq("S2", 3L, "Doing", 2.0, "2020-02-01"),
      Seq("S2", 4L, "Todo", 8.0, "2020-02-02"),
      Seq("S3", 5L, "Done", 1.0, "2020-03-01")))

  test("series: pivoted Velocity output as AsTable — per column, the " +
      "frame's ordered (key, value) pairs, numeric keys typed") {
    val prog = HbParser.parse(
      """only !(State = 'Todo')
        |group by Sprint Item -> maxby Changed
        |create column SprintNumber (int (regex [Sprint] /S([0-9]+)/ [$1]))
        |pivot [SprintNumber] [State] -> count [Item]
        |sort by column SprintNumber
        |create column m (moving mean 2 [Done])
        |slice columns Done m
        |""".stripMargin)
    val keyed = graft.hb.Engine.runKeyed(prog, workitems)
    val ss = Render.series(keyed)
    assert(ss.map(_._1) == Seq("Done", "m"))
    val done = ss.head._2
    assert(done.map(_._1.toString) == Seq("1", "2", "3")) // sorted keys
    assert(done.map(p => Option(p._2)) ==
      Seq(Some(2L), None, Some(1L)))
    val m = ss(1)._2
    assert(m.map(p => Option(p._2)) == Seq(None, Some(2.0), Some(1.0)))
    // the web reader's JSON: names dropped, numbers bare, nulls null,
    // integral floats without the decimal point (Reader.fs:221-231)
    assert(Render.seriesJson(keyed) ==
      """[[{"x":1,"y":2},{"x":2,"y":null},{"x":3,"y":1}],""" +
      """[{"x":1,"y":null},{"x":2,"y":2},{"x":3,"y":1}]]""")
  }

  test("series: composite (multi-column group) keys join with '.' (CLI " +
      "Chart.fs) and '-' in the web JSON (Reader.fs KeyType.List)") {
    val df = Ingest.localData(spark, Seq("g", "h", "v"),
      Seq(Seq("a", "x", 1.0), Seq("a", "x", 2.0), Seq("b", "y", 10.0)))
    val keyed = graft.hb.Engine.runKeyed(
      HbParser.parse("group by g h -> sum\nslice columns v"), df)
    val ss = Render.series(keyed)
    assert(ss.map(_._1) == Seq("v"))
    assert(ss.head._2.map(_._1) == Seq("a.x", "b.y"))
    assert(ss.head._2.map(_._2) == Seq(3.0, 10.0))
    assert(Render.seriesJson(keyed) ==
      """[[{"x":"a-x","y":3},{"x":"b-y","y":10}]]""")
  }

  test("series: a missing key raises (Reader.fs: a key can't be " +
      "missing); text values render as escaped JSON text") {
    val df = Ingest.localData(spark, Seq("k", "t"),
      Seq(Seq(1L, "say \"hi\"\n"), Seq(2L, "plain")))
    val keyed = graft.hb.Engine.runKeyed(
      HbParser.parse("index rows by k\nslice columns t"), df)
    assert(Render.seriesJson(keyed) ==
      """[[{"x":1,"y":"say \"hi\"\n"},{"x":2,"y":"plain"}]]""")
    val nullKey = graft.hb.Engine.runKeyed(HbParser.parse(
      "create column nk (if [k = 1] {2} else {missing})\n" +
        "index rows by nk\nslice columns t"), df)
    intercept[IllegalArgumentException](Render.series(nullKey))
  }

  test("the 7-program corpus renders: prose + code blocks that " +
      "re-parse (no sources needed — presentation only)") {
    val corpusDir = "/root/reference/tests/transformations"
    val names = new java.io.File(corpusDir).listFiles()
      .map(_.getName).filter(_.endsWith(".hb")).sorted
    assert(names.length == 7)
    names.foreach { n =>
      val text = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$corpusDir/$n")), "UTF-8")
      val prog = HbParser.parse(text)
      val html = Render.html(prog)
      assert(html.contains("<pre><code>"), s"$n rendered no code")
      val code = html.split("<pre><code>")(1).split("</code></pre>")(0)
        .replace("&lt;", "<").replace("&gt;", ">")
        .replace("&quot;", "\"").replace("&amp;", "&")
      HbParser.parse(code) // printed statements stay valid .hb
    }
  }
}
