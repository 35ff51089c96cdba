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
}
