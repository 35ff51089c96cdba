package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** The canonical text-analysis signal columns — ONE definition each,
  * shared by the gate catalogue (TextGates) and the `.hb` expression
  * surface (`tokens (e)` / `quality (e)` / `langid (e)` /
  * `repetition (e)`, Ast.TextSig), so the two surfaces can never drift.
  *
  * All are pure codegen'd expression pipelines over a string column —
  * narrow maps, zero shuffles, whole-stage-codegen friendly at any
  * scale. Each numeric signal is built from integer counts with single
  * IEEE-double divisions, so a SQL oracle reproduces the bits exactly.
  *
  * The reference's whole authoring UX is its closed expression DSL
  * (tools/hobbes-vscode/.vscode/hobbes-autocomplete.code-snippets:3-213
  * — everything an author needs is an expression or statement); these
  * give the curation signals that same first-class standing.
  */
object TextSignals {

  /** Null-safe array size: legacy `size(null)` is -1 with ANSI off;
    * map the sentinel back to null (DuckDB `len(NULL)` parity). */
  private def sizeNS(arr: Column): Column = {
    val s = size(arr)
    when(s >= 0, s)
  }

  private def normed(c: Column): Column = regexp_replace(c, "\\s+", " ")

  /** Whitespace token count: runs of non-space characters (`\S+`). */
  def tokens(c: Column): Column =
    sizeNS(regexp_extract_all(c, lit("\\S+"), lit(0)))

  /** Sentence-punctuation count (the quality score's numerator). */
  def punctCount(c: Column): Column =
    sizeNS(regexp_extract_all(c, lit("[.,;:!?]"), lit(0)))

  /** English stopword-marker hits (the C4-family density signal). */
  def stopwordCount(c: Column): Column =
    sizeNS(regexp_extract_all(lower(c),
      lit("\\b(the|a|an|and|or|of|to|in|is|it)\\b"), lit(0)))

  /** Bounded [0,1] quality score — length, punctuation and stopword
    * ratios folded together (t_quality_score's formula):
    * `least(nTok/100,1) · (1−least(punct,1)) · (0.5+least(stop,0.5))`. */
  def quality(c: Column): Column = {
    val nTok = tokens(c)
    val punctRatio = punctCount(c) * lit(1.0) / (nTok + lit(1))
    val stopRatio = stopwordCount(c) * lit(1.0) / (nTok + lit(1))
    least(nTok * lit(1.0) / lit(100.0), lit(1.0)) *
      (lit(1.0) - least(punctRatio, lit(1.0))) *
      (lit(0.5) + least(stopRatio, lit(0.5)))
  }

  /** Language guess by stopword-marker counts with a deterministic
    * argmax tie-break (en > de > fr > es) — t_langid's heuristic. */
  def langid(c: Column): Column = {
    def hits(pat: String) =
      sizeNS(regexp_extract_all(lower(c), lit(pat), lit(0)))
    val en = hits("\\b(the|and|of|to|in|is)\\b")
    val de = hits("\\b(der|die|das|und|ist|nicht)\\b")
    val fr = hits("\\b(le|la|les|et|est|une)\\b")
    val es = hits("\\b(el|los|las|y|es|una)\\b")
    when(en >= de && en >= fr && en >= es, lit("en"))
      .otherwise(when(de >= fr && de >= es, lit("de"))
        .otherwise(when(fr >= es, lit("fr")).otherwise(lit("es"))))
  }

  /** Duplicate-token mass: `(n − distinct) / n` over the lowercased,
    * whitespace-normalized token list — t_repetition's
    * `dup_token_frac` (the Gopher-family repetition signal). */
  def repetition(c: Column): Column = {
    val tk = split(lower(normed(c)), "\\s+")
    val n = sizeNS(tk)
    (n - sizeNS(array_distinct(tk))).cast(DoubleType) / n
  }
}
