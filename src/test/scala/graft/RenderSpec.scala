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
}
