package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Fixed-window document chunking with stride — split each document
  * into `window`-token chunks starting every `stride` tokens
  * (stride < window gives overlapping context windows; stride == window
  * gives a disjoint partition). The preprocessing twin of
  * [[Packing]]: chunking cuts documents DOWN to a sequence budget,
  * packing concatenates them UP to one.
  *
  * 100 TB shape: a pure narrow map + explode — the chunk layout for a
  * document depends only on that document's tokens, so there is NO
  * shuffle at any scale; chunk rows are emitted inside the scan stage.
  * Every start position < n_tokens is emitted (the tail chunk may be
  * shorter than `window`), so chunk coverage is total and the layout is
  * a pure function of the text.
  */
object Chunking {

  /** One row per (document, chunk): chunk_id, tok_start, n_chunk_tokens
    * and the chunk's text digest. chunk_id == tok_start / stride, so the
    * layout is reproducible without an ordinal window. */
  def chunkLayout(df: DataFrame, idCol: String, textCol: String,
      window: Int, stride: Int): DataFrame = {
    require(window >= 1 && stride >= 1 && stride <= window,
      s"need 1 <= stride <= window, got window=$window stride=$stride")
    val tk = split(regexp_replace(col(textCol), "\\s+", " "), " ")
    // a NULL text has no tokens and must emit no chunks — without the
    // filter, greatest(NULL - 1, 0) IGNORES the null (greatest skips
    // nulls) and sequence() would emit one garbage start position
    df.filter(col(textCol).isNotNull)
      .select(col(idCol), tk.as("__tk"), size(tk).as("__n"))
      .select(col(idCol), col("__tk"), col("__n"),
        explode(sequence(lit(0), greatest(col("__n") - 1, lit(0)),
          lit(stride))).as("tok_start"))
      .select(col(idCol),
        (col("tok_start") / stride).cast(LongType).as("chunk_id"),
        col("tok_start").cast(LongType).as("tok_start"),
        least(lit(window), col("__n") - col("tok_start"))
          .cast(LongType).as("n_chunk_tokens"),
        md5(concat_ws(" ",
          slice(col("__tk"), col("tok_start") + 1, lit(window))))
          .as("chunk_md5"))
  }
}
