package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Retrieval

/** Behavioral checks for the hybrid-retrieval family: planted lexical
  * overlaps must rank by shared-term count, the df stopword cut must
  * drop ubiquitous terms, and reciprocal-rank fusion must do exact
  * integer contribution arithmetic. */
class RetrievalSpec extends AnyFunSuite {

  lazy val spark = Sessions.local()
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("lexical overlap ranks by distinct shared terms, excludes self") {
    val corpus = docs(
      0L -> "alpha beta gamma delta",
      1L -> "alpha beta gamma zzz",   // 3 shared
      2L -> "alpha beta yyy xxx",     // 2 shared
      3L -> "alpha www vvv uuu",      // 1 shared
      4L -> "qqq rrr sss ttt")        // 0 shared
    val out = Retrieval.lexicalOverlapTopK(corpus,
      corpus.filter(col("doc_id") === 0L), "doc_id", "text", k = 10,
      maxDfPermille = 1000)
      .orderBy("rank")
      .collect()
    assert(out.map(r => (r.getAs[Long]("neighbor_id"),
      r.getAs[Long]("overlap"))).toSeq ===
      Seq((1L, 3L), (2L, 2L), (3L, 1L)))
    assert(!out.exists(_.getAs[Long]("neighbor_id") == 0L))
  }

  test("BM25 ranking: rarer terms outweigh common ones, repeated terms " +
      "saturate, and the score replays the exact Okapi fixed-point form") {
    // query shares "beta" (df 4) and "rare" (df 2): doc 10 matches only
    // the rare term, doc 11 only the common one — idf must rank 10
    // above 11 even though the overlap COUNT ties
    val corpus = docs(
      0L -> "rare beta query doc",
      10L -> "rare zzz yyy xxx",
      11L -> "beta zz2 yy2 xx2",
      12L -> "beta zz3 yy3 xx3",
      13L -> "beta zz4 yy4 xx4",
      14L -> "www vvv uuu ttt")
    val out = Retrieval.lexicalBm25TopK(corpus,
      corpus.filter(col("doc_id") === 0L), "doc_id", "text", k = 10,
      maxDfPermille = 1000)
      .orderBy("rank").collect()
    val ranked = out.map(_.getAs[Long]("neighbor_id")).toSeq
    assert(ranked.head === 10L, s"rare-term doc must rank first: $ranked")
    assert(ranked.toSet === Set(10L, 11L, 12L, 13L))
    // exact fixed-point replay of the top hit: tf=1, dl=4, avgdl=4,
    // n=6, df(rare)=2 → idf=(6-2+0.5)/(2+0.5)=1.8, tfn=2.2/2.2=1
    val top = out.head.getAs[Long]("score_fp")
    assert(top === math.floor(1.8 * 1.0 * 1e9).toLong, s"got $top")
    // term repetition saturates (k1): a doc repeating "rare" 3× scores
    // higher than tf=1 but far below 3× the tf=1 contribution
    val corpus2 = docs(
      0L -> "rare query",
      20L -> "rare rare rare aaa",
      21L -> "rare bbb ccc ddd",
      22L -> "eee fff ggg hhh")
    val o2 = Retrieval.lexicalBm25TopK(corpus2,
      corpus2.filter(col("doc_id") === 0L), "doc_id", "text", k = 10,
      maxDfPermille = 1000)
      .orderBy("rank").collect()
      .map(r => r.getAs[Long]("neighbor_id") -> r.getAs[Long]("score_fp"))
      .toMap
    assert(o2(20L) > o2(21L))
    assert(o2(20L) < 3L * o2(21L))
  }

  test("df stopword cut drops ubiquitous terms from the score") {
    // "alpha" is in every doc; at maxDfPermille=500 it cannot score, so
    // doc 3 (only "alpha" shared) disappears and doc 2 loses one point
    val corpus = docs(
      0L -> "alpha beta gamma delta",
      1L -> "alpha beta gamma zzz",
      2L -> "alpha beta yyy xxx",
      3L -> "alpha www vvv uuu",
      4L -> "alpha qqq rrr sss",
      5L -> "alpha qq2 rr2 ss2",
      6L -> "alpha qq3 rr3 ss3")
    val out = Retrieval.lexicalOverlapTopK(corpus,
      corpus.filter(col("doc_id") === 0L), "doc_id", "text", k = 10,
      maxDfPermille = 500)
      .orderBy("rank")
      .collect()
    // beta df=3/7 (≤50%) survives; gamma df=2/7 survives; alpha df=7/7 cut
    assert(out.map(r => (r.getAs[Long]("neighbor_id"),
      r.getAs[Long]("overlap"))).toSeq ===
      Seq((1L, 2L), (2L, 1L)))
  }

  test("tokenization is case-insensitive and whitespace-collapsing") {
    val corpus = docs(
      0L -> "Alpha\t BETA  gamma",
      1L -> "alpha beta other")
    val out = Retrieval.lexicalOverlapTopK(corpus,
      corpus.filter(col("doc_id") === 0L), "doc_id", "text", k = 10,
      maxDfPermille = 1000).collect()
    assert(out.length == 1 && out.head.getAs[Long]("overlap") == 2L)
  }

  test("rrfFuse sums exact integer contributions across lists") {
    val a = Seq((0L, 1, 10L), (0L, 2, 11L)).toDF("query_id", "rank", "neighbor_id")
    val b = Seq((0L, 1, 10L), (0L, 2, 12L)).toDF("query_id", "rank", "neighbor_id")
    val out = Retrieval.rrfFuse(Seq(a, b), k = 10).orderBy("rank").collect()
    val c1 = 1000000000L / 61 // rank 1, c=60, integer division
    val c2 = 1000000000L / 62
    // doc 10: rank 1 in both lists; docs 11/12: rank 2 in one list each
    assert(out.map(r => (r.getAs[Long]("neighbor_id"),
      r.getAs[Long]("rrf_fp"), r.getAs[Long]("n_lists"))).toSeq ===
      Seq((10L, 2 * c1, 2L), (11L, c2, 1L), (12L, c2, 1L)))
  }

  test("rrfFuse ties break by neighbor_id and k bounds the output") {
    val a = Seq((0L, 1, 5L), (0L, 2, 3L), (0L, 3, 9L))
      .toDF("query_id", "rank", "neighbor_id")
    val out = Retrieval.rrfFuse(Seq(a, a), k = 2).orderBy("rank").collect()
    assert(out.length == 2)
    assert(out.map(_.getAs[Long]("neighbor_id")).toSeq === Seq(5L, 3L))
  }

  test("guards reject bad parameters") {
    val a = Seq((0L, 1, 5L)).toDF("query_id", "rank", "neighbor_id")
    intercept[IllegalArgumentException](Retrieval.rrfFuse(Seq.empty, 5))
    intercept[IllegalArgumentException](Retrieval.rrfFuse(Seq(a), 0))
    intercept[IllegalArgumentException](
      Retrieval.lexicalOverlapTopK(a, a, "neighbor_id", "x", 5,
        maxDfPermille = 0))
  }
}
