package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Unigram

/** Unigram-LM tokenizer: candidate fit, bitlen costs, Viterbi
  * segmentation with the (cost, pieces, length) tie order, hard-EM
  * refit, [UNK] collapse. */
class UnigramSpec extends AnyFunSuite {

  lazy val spark = Sessions.local()
  import spark.implicits._

  test("fit keeps every character and the top multi-char substrings") {
    val docs = Seq((1L, "abab abab cd")).toDF("doc_id", "text")
    val pieces = Unigram.fit(docs, "text", topMulti = 2)
    val byPiece = pieces.map(p => p.piece -> p).toMap
    assert(Seq("a", "b", "c", "d").forall(byPiece.contains))
    // "ab" occurs 4x (2 per "abab" word, 2 words) — top multi
    assert(byPiece.contains("ab"))
    assert(pieces.forall(_.costBits >= 0))
    // rarer pieces cost at least as much as frequent ones
    assert(byPiece("c").costBits >= byPiece("ab").costBits)
  }

  test("Viterbi picks the min-cost segmentation; ties prefer fewer, " +
    "longer pieces") {
    // costs: ab=1, a=3, b=3 → "abab" = [ab, ab] (cost 2) not 4 chars
    val model = Seq(
      Unigram.Piece("ab", 8, 1), Unigram.Piece("a", 2, 3),
      Unigram.Piece("b", 2, 3))
    val out = Seq((1L, "abab ab a"))
      .toDF("doc_id", "text")
      .select(Unigram.encodeCol(col("text"), model).as("p"))
      .head().getSeq[String](0)
    assert(out === Seq("ab", "ab", "ab", "a"))
  }

  test("out-of-alphabet word collapses to [UNK]") {
    val model = Seq(Unigram.Piece("a", 1, 1))
    val out = Seq((1L, "aa qq"))
      .toDF("doc_id", "text")
      .select(Unigram.encodeCol(col("text"), model).as("p"))
      .head().getSeq[String](0)
    assert(out === Seq("a", "a", "[UNK]"))
  }

  test("fitEm refit keeps full coverage and segmentation is lossless " +
    "per word") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cats sat"),
      (3L, "a mat on a cat")).toDF("doc_id", "text")
    val m1 = Unigram.fit(docs, "text", topMulti = 8)
    val m2 = Unigram.refit(docs, "text", m1)
    assert(m2.map(_.piece) === m1.map(_.piece)) // smoothing keeps all
    assert(m2.forall(_.freq >= 1L))
    val seg = docs.select(col("doc_id"),
      Unigram.encodeCol(col("text"), m2).as("p")).orderBy("doc_id")
      .collect()
    // pieces concatenate back to the words (no markers — lossless at
    // word level)
    seg.zip(Seq("thecatsatonthemat", "thecatssat", "amatonacat"))
      .foreach { case (r, expected) =>
        assert(r.getSeq[String](1).mkString == expected)
      }
    assert(!seg.exists(_.getSeq[String](1).contains("[UNK]")))
  }

  test("deterministic across repeated fits") {
    val docs = Seq((1L, "spark scan table scan spark table x"))
      .toDF("doc_id", "text")
    val a = Unigram.fitEm(docs, "text", topMulti = 6)
    val b = Unigram.fitEm(docs, "text", topMulti = 6)
    assert(a === b)
  }

  test("DP matches brute-force enumeration under the documented " +
    "total order (cost, pieces, longest-last-piece)") {
    val rnd = new scala.util.Random(29)
    // random small vocab over {a,b}: chars + a few multi-char pieces
    val multis = Seq("aa", "ab", "ba", "bb", "aba", "bab", "abab")
    for (_ <- 0 until 30) {
      val vocab = (Seq("a", "b") ++
        rnd.shuffle(multis).take(2 + rnd.nextInt(4)))
        .map(p => Unigram.Piece(p, 1, 1 + rnd.nextInt(4)))
      val costs = vocab.map(p => p.piece -> p.costBits).toMap
      val word = (0 until (1 + rnd.nextInt(6)))
        .map(_ => if (rnd.nextBoolean()) 'a' else 'b').mkString
      // brute force: all segmentations, keyed by (cost, n, reversed
      // piece-length sequence compared descending) — the global order
      // the per-cell (cost, pieces, length DESC) tie rule induces
      def segs(w: String): Seq[List[String]] =
        if (w.isEmpty) Seq(Nil)
        else (1 to w.length).flatMap { l =>
          val p = w.take(l)
          if (costs.contains(p)) segs(w.drop(l)).map(p :: _) else Nil
        }
      val all = segs(word)
      import scala.math.Ordering.Implicits._
      val expected = all.minBy(s =>
        (s.map(costs).sum, s.length, s.reverse.map(p => -p.length).toList))
      val got = Seq(Tuple1(word)).toDF("text")
        .select(Unigram.encodeCol(col("text"), vocab).as("p"))
        .head().getSeq[String](0)
      assert(got.toList === expected, s"word=$word vocab=$costs")
    }
  }

  test("guards") {
    val df = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](Unigram.fit(df, "text", -1))
    intercept[IllegalArgumentException](
      Unigram.encodeCol(col("text"), Seq.empty))
  }
}
