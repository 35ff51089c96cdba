package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SubstringDedup

/** Exact arbitrary-length repeated-substring dedup (Lee et al. 2022
  * EXACTSUBSTR): maximal merged spans at token granularity, exact
  * two-phase counting, scrub reconstruction. */
class SubstringDedupSpec extends AnyFunSuite {

  lazy val spark = Sessions.local()
  import spark.implicits._

  private def words(prefix: String, n: Int): String =
    (0 until n).map(i => s"$prefix$i").mkString(" ")

  test("a long verbatim repeat comes back as ONE maximal span in every " +
      "copy — arbitrary length, not window-aligned pieces") {
    // a 40-token quote planted inside two otherwise-unique documents
    val quote = words("q", 40)
    val docs = Seq(
      (1L, words("a", 7) + " " + quote + " " + words("b", 5)),
      (2L, words("c", 3) + " " + quote),
      (3L, words("d", 30))).toDF("doc_id", "text")
    val spans = SubstringDedup.repeatedSpans(docs, "doc_id", "text", 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
      .sortBy(x => (x._1, x._2))
    // doc 1: the quote occupies tokens 8..47; doc 2: tokens 4..43 —
    // each ONE 40-token span, doc 3 clean
    assert(spans.toSeq == Seq((1L, 8, 40), (2L, 4, 40)))
  }

  test("scrub excises exactly the covered positions, all copies; " +
      "sub-k repeats survive; short docs pass through") {
    val quote = words("q", 12)
    val docs = Seq(
      (1L, words("a", 4) + " " + quote),
      (2L, quote + " " + words("b", 4)),
      // a 7-token repeat is BELOW k=8 — must survive in both docs
      (3L, words("r", 7) + " " + words("x", 6)),
      (4L, words("r", 7) + " " + words("y", 6)),
      (5L, "tiny doc")).toDF("doc_id", "text")
    val out = SubstringDedup.scrubRepeats(docs, "doc_id", "text", 8)
      .orderBy("doc_id")
      .select("doc_id", "scrubbed", "n_removed").collect()
    assert(out(0).getString(1) == words("a", 4))
    assert(out(0).getLong(2) == 12L)
    assert(out(1).getString(1) == words("b", 4))
    assert(out(1).getLong(2) == 12L)
    assert(out(2).getString(1) == words("r", 7) + " " + words("x", 6))
    assert(out(2).getLong(2) == 0L)
    assert(out(3).getLong(2) == 0L)
    assert(out(4).getString(1) == "tiny doc" && out(4).getLong(2) == 0L)
  }

  test("within-document repetition counts (a doc quoting itself is a " +
      "repeat), and overlapping repeats merge into one span") {
    val block = words("s", 10)
    val docs = Seq(
      (1L, block + " " + block),
      (2L, words("u", 20))).toDF("doc_id", "text")
    val spans = SubstringDedup.repeatedSpans(docs, "doc_id", "text", 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
      .sortBy(x => (x._1, x._2))
    // duplicated window starts are 1-3 (first copy) and 11-13 (second)
    // — two maximal runs, so two spans of 10, covering all 20 tokens
    assert(spans.toSeq == Seq((1L, 1, 10), (1L, 11, 10)))
    val scrubbed = SubstringDedup.scrubRepeats(docs, "doc_id", "text", 8)
      .filter(col("doc_id") === 1L).head()
    assert(scrubbed.getAs[String]("scrubbed") == "")
    assert(scrubbed.getAs[Long]("n_removed") == 20L)
  }

  test("keepFirst: the canonical copy (lowest doc, then offset) " +
      "survives; every other copy is scrubbed") {
    val quote = words("q", 12)
    val docs = Seq(
      (1L, words("a", 4) + " " + quote),
      (2L, quote + " " + words("b", 4)),
      (3L, words("c", 2) + " " + quote + " end0 end1")).toDF("doc_id", "text")
    val out = SubstringDedup.scrubRepeats(docs, "doc_id", "text", 8,
      keepFirst = true).orderBy("doc_id")
      .select("doc_id", "scrubbed", "n_removed").collect()
    // doc 1 holds the canonical occurrence — untouched
    assert(out(0).getString(1) == words("a", 4) + " " + quote)
    assert(out(0).getLong(2) == 0L)
    // docs 2 and 3 lose their copies
    assert(out(1).getString(1) == words("b", 4) && out(1).getLong(2) == 12L)
    assert(out(2).getString(1) == words("c", 2) + " end0 end1")
    assert(out(2).getLong(2) == 12L)
    // remove-all (default) scrubs every copy including the canonical
    val all = SubstringDedup.scrubRepeats(docs, "doc_id", "text", 8)
      .orderBy("doc_id").select("n_removed").collect()
    assert(all.forall(_.getLong(0) == 12L))
  }

  test("guards") {
    val df = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](
      SubstringDedup.repeatedSpans(df, "doc_id", "text", 1).collect())
  }

  test("rolling-digest phase 1 finds EXACTLY the string-counted " +
      "duplicated windows (random corpus with planted repeats)") {
    // adversarial mix: shared quotes, self-repeats, near-misses that
    // differ in one token, docs shorter than k, punctuation/case noise
    val rnd = new scala.util.Random(41)
    val pool = Array("the", "Quick", "fox", "42", "x,y", "end.", "of")
    val quote = words("q", 9)
    val docs = (Seq.tabulate(40)(i => (i.toLong,
      (0 until 4 + rnd.nextInt(25))
        .map(_ => pool(rnd.nextInt(pool.length))).mkString(" ") +
        (if (i % 5 == 0) " " + quote else ""))) ++ Seq(
      (100L, quote + " " + quote),
      (101L, words("q", 8) + " DIFFERENT"),
      (102L, "short doc")))
      .toDF("doc_id", "text")
    val k = 5
    val got = SubstringDedup.duplicatedWindows(docs, "doc_id", "text", k)
      .collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    // reference: the O(k)-string formulation phase 1 replaced — exact
    // window strings counted corpus-wide
    val toks = filter(graft.operators.Decontaminate.tokens(col("text")),
      w => length(w) > 0)
    val win = docs.select(col("doc_id"), toks.as("tk"))
      .select(col("doc_id"),
        explode(when(size(col("tk")) >= k,
          sequence(lit(1), size(col("tk")) - k + 1))
          .otherwise(array().cast("array<int>"))).as("off"),
        col("tk"))
      .select(col("doc_id"), col("off"),
        array_join(slice(col("tk"), col("off"), lit(k)), " ").as("gram"))
    val dupG = win.groupBy("gram").agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2).select("gram")
    val expect = win.join(dupG, "gram").select("doc_id", "off")
      .collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    assert(expect.nonEmpty, "fixture must plant real repeats")
    assert(got == expect)
  }
}
