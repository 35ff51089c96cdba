package graft.hb

import org.apache.spark.sql.DataFrame
import Ast._

/** Literate rendering: a parsed `.hb` program → standalone HTML.
  *
  * The reference's visualizer walks the statement list and renders
  * `!#…!#` comment blocks as prose between the computation steps
  * (tools/visualizer/cli/src/Program.fs, Comment branch ~line 268);
  * blocks are already retained in the AST here (`Ast.Comment`), so this
  * is the missing last step. Statements between prose render as code
  * (re-printed through Printer, so the output is always valid `.hb`),
  * and an optional result table renders as an HTML table — the same
  * driver-side, row-bounded contract as the matrix JSON sink.
  */
object Render {

  /** Render `program` (and optionally the frame it produced) as HTML. */
  def html(program: Program, result: Option[DataFrame] = None,
      maxRows: Int = 100): String = {
    val body = new StringBuilder
    var code = List.empty[Statement]
    def flushCode(): Unit = if (code.nonEmpty) {
      body.append("<pre><code>")
        .append(esc(code.reverse.map(Printer.print).mkString("\n")))
        .append("</code></pre>\n")
      code = Nil
    }
    program.statements.foreach {
      case Comment(text) =>
        flushCode()
        // blank-line-separated paragraphs, like the reference's prose
        text.trim.split("\n\\s*\n").filter(_.trim.nonEmpty).foreach { p =>
          body.append("<p>").append(esc(p.trim)).append("</p>\n")
        }
      case st => code = st :: code
    }
    flushCode()
    result.foreach(df => body.append(table(df, maxRows)))
    s"""<!DOCTYPE html>
       |<html><head><meta charset="utf-8"><title>graft</title></head>
       |<body>
       |${body.result()}</body></html>
       |""".stripMargin
  }

  /** First `maxRows` rows as an HTML table (driver-side by contract —
    * the gateway-document shape, like sinks.Sinks.matrixJson). */
  def table(df: DataFrame, maxRows: Int = 100): String = {
    val cols = df.columns.toSeq
    val head = cols.map(c => s"<th>${esc(c)}</th>").mkString
    val rows = df.limit(maxRows).collect().map { r =>
      cols.indices.map { i =>
        val v = r.get(i)
        s"<td>${esc(if (v == null) "" else v.toString)}</td>"
      }.mkString("<tr>", "", "</tr>")
    }.mkString("\n")
    s"<table>\n<thead><tr>$head</tr></thead>\n<tbody>$rows</tbody>\n</table>\n"
  }

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  // ------------------------------------------------------ chart series

  /** Column-series view of a KEYED frame ([[Engine.runKeyed]]) — the
    * reference's `DataMatrix.AsTable()` consumer shape: one entry per
    * non-key column holding the frame's ORDERED (key, value) pairs.
    * Composite (struct) keys — multi-column `group by` — join their
    * parts with `listSep`, exactly the reference's KeyType.List
    * handling: "." in the CLI chart renderer
    * (tools/visualizer/cli/src/Chart.fs:186-192), "-" in the web
    * reader (tools/visualizer/web/src/Server/Reader.fs:196-204).
    * Scalar keys pass through typed (numbers stay numbers). A missing
    * (null) key RAISES — Reader.fs:204: "A key can't be missing".
    * Driver-side and row-bounded by contract, like the HTML table. */
  def series(keyedDf: DataFrame, maxRows: Int = 10000,
      listSep: String = "."): Seq[(String, Seq[(Any, Any)])] =
    seriesTruncating(keyedDf, maxRows, listSep)._1

  /** [[series]] plus a truncation flag — probes one row past the bound
    * (the gateway JSON route's `take(maxRows + 1)` discipline) so a
    * chart of a larger frame can SAY it plotted a prefix instead of
    * silently dropping the tail. */
  def seriesTruncating(keyedDf: DataFrame, maxRows: Int = 10000,
      listSep: String = "."): (Seq[(String, Seq[(Any, Any)])], Boolean) = {
    require(keyedDf.columns.contains(Engine.KEY),
      "series needs the engine-keyed frame — run via Engine.runKeyed")
    val allCols = keyedDf.columns.toSeq
    val ki = allCols.indexOf(Engine.KEY)
    val probe = keyedDf.limit(maxRows + 1).collect().toSeq
    val truncated = probe.length > maxRows
    val rows = probe.take(maxRows)
    val out = allCols.filterNot(_ == Engine.KEY).map { c =>
      val ci = allCols.indexOf(c)
      c -> rows.map { r =>
        if (r.isNullAt(ki))
          throw new IllegalArgumentException("a key can't be missing")
        (keyRender(r.get(ki), listSep), r.get(ci))
      }
    }
    (out, truncated)
  }

  /** The web reader's chart JSON (Reader.fs:221-231): an array of
    * series, each an array of `{"x":…,"y":…}` points, column names
    * dropped, list keys joined "-", numbers as bare JSON numbers
    * (integral floats print without the decimal point — the F#
    * `string 5.0 = "5"` convention), everything else quoted text. */
  def seriesJson(keyedDf: DataFrame, maxRows: Int = 10000): String =
    seriesJsonTruncating(keyedDf, maxRows)._1

  /** [[seriesJson]] plus the truncation flag (see
    * [[seriesTruncating]]) — the chart route surfaces it as
    * X-Truncated, mirroring /data/json. */
  def seriesJsonTruncating(keyedDf: DataFrame,
      maxRows: Int = 10000): (String, Boolean) = {
    val (ss, truncated) = seriesTruncating(keyedDf, maxRows, listSep = "-")
    val body = ss.map { case (_, pts) =>
      pts.map { case (x, y) =>
        s"""{"x":${pointJson(x)},"y":${pointJson(y)}}"""
      }.mkString("[", ",", "]")
    }.mkString("[", ",", "]")
    (body, truncated)
  }

  private def keyRender(k: Any, sep: String): Any = k match {
    case r: org.apache.spark.sql.Row =>
      (0 until r.length).map(i =>
        if (r.isNullAt(i)) "" else r.get(i).toString).mkString(sep)
    case v => v
  }

  private def pointJson(v: Any): String = v match {
    case null => "null"
    case n @ (_: Byte | _: Short | _: Int | _: Long) => n.toString
    case d: Double => numJson(d)
    case f: Float => numJson(f.toDouble)
    case d: java.math.BigDecimal => numJson(d.doubleValue())
    case s => "\"" + jsonEsc(s.toString) + "\""
  }

  private def numJson(d: Double): String =
    if (d.isNaN || d.isInfinite) "\"" + d.toString + "\""
    else if (d == math.floor(d) && math.abs(d) < 1e15) d.toLong.toString
    else d.toString

  private def jsonEsc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
}
