package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic "NFKC-lite" text cleanup -- the normalization pass
  * every corpus ingest runs before tokenizing, restricted to the
  * transformations that replay BIT-FOR-BIT in any engine (full ICU
  * NFKC is library-versioned; these rules are closed-form):
  *
  *   1. punctuation unification (1:1 `translate`): curly single and
  *      double quotes and low-9 variants to ASCII, en/em dash and
  *      minus sign to `-`, NBSP / figure space / narrow NBSP /
  *      ideographic space to plain space (none of these are `\\s` to
  *      RE2 or non-UNICODE Java regex, so the collapse step would
  *      miss them);
  *   2. ellipsis (U+2026) to `...` (1:N, one regexp);
  *   3. deletion of control chars (C0 except tab/LF/CR, DEL),
  *      zero-width space/joiners, BOM/ZWNBSP and soft hyphen -- the
  *      invisible bytes that survive scraping and poison dedup
  *      fingerprints;
  *   4. whitespace collapse + trim;
  *   5. optional lowercase.
  *
  * Every non-ASCII codepoint is written as a \uXXXX escape so this
  * file stays plain reviewable ASCII (the Gateway NUL lesson).
  * Pure codegen'd narrow expressions (translate + three
  * regexp_replace) -- zero shuffles at any scale. */
object TextNorm {

  // curly quotes (2018 2019 201A 201B 201C 201D 201E), dashes/minus
  // (2013 2014 2212), exotic spaces (00A0 2007 202F 3000)
  private val FromChars =
    "\u2018\u2019\u201A\u201B\u201C\u201D\u201E" +
      "\u2013\u2014\u2212" +
      "\u00A0\u2007\u202F\u3000"
  private val ToChars =
    "''''" + "\"\"\"" + "---" + "    "

  /** The codepoints of the translate map, exposed so a SQL oracle can
    * rebuild the identical `translate` call from `chr()` without
    * embedding raw unicode in query text. */
  def translatePairs: Seq[(Int, Char)] =
    FromChars.zip(ToChars).map { case (f, t) => (f.toInt, t) }.toSeq

  def normalize(c: Column, lowercase: Boolean = false): Column = {
    require(FromChars.length == ToChars.length,
      "translate map arity mismatch")
    val mapped = translate(c, FromChars, ToChars)
    val ell = regexp_replace(mapped, "\u2026", "...")
    // C0 minus tab/LF/CR, DEL, zero-width 200B-200D, BOM FEFF, soft
    // hyphen 00AD
    val stripped = regexp_replace(ell,
      "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F" +
        "\u200B-\u200D\uFEFF\u00AD]", "")
    val collapsed = trim(regexp_replace(stripped, "\\s+", " "))
    if (lowercase) lower(collapsed) else collapsed
  }
}
