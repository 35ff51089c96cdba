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

  test("non-BMP pieces: the native DP walks CODE POINTS (a UTF-16 walk " +
      "would mis-cap the 2-code-point piece and split surrogate pairs)") {
    // "😀😁" is 2 code points / 4 UTF-16 units; under maxPieceLen = 2
    // the cheap 2-piece segmentation exists only in code-point units
    val pieces = Seq(
      Unigram.Piece("😀", 8, 5), Unigram.Piece("😁", 8, 5),
      Unigram.Piece("😀😁", 16, 3))
    val got = Seq(Tuple1("😀😁😀")).toDF("text")
      .select(Unigram.encodeCol(col("text"), pieces, maxPieceLen = 2)
        .as("p"))
      .head().getSeq[String](0)
    assert(got.toList === List("😀😁", "😀"))
  }

  test("fitTarget: prune-EM reaches the EXACT requested vocabulary " +
      "size, keeps every single character, and never strands a word") {
    val rnd = new scala.util.Random(41)
    val alphabet = "abcdefg"
    val words = (0 until 120).map(_ =>
      (0 until (2 + rnd.nextInt(8)))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    val docs = words.grouped(10).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toSeq
      .toDF("doc_id", "text")
    val target = 20
    val model = Unigram.fitTarget(docs, "text", target, maxPieceLen = 4)
    assert(model.size === target)
    // the character-coverage invariant: every corpus character survives
    val chars = words.flatMap(_.toSeq).map(_.toString).toSet
    assert(chars.subsetOf(model.map(_.piece).toSet))
    // …so the trained model never [UNK]s its own training corpus, and
    // the segmentation concatenates back to each word exactly
    val enc = docs.select(col("doc_id"),
      array_join(Unigram.encodeCol(col("text"), model, maxPieceLen = 4),
        "").as("glued"))
      .orderBy("doc_id").collect()
    val expected = words.grouped(10).map(_.mkString).toSeq
    enc.zip(expected).foreach { case (r, e) =>
      assert(!r.getString(1).contains("[UNK]"))
      assert(r.getString(1) === e)
    }
    // a tighter target is a subset-sized model, still exact
    val small = Unigram.fitTarget(docs, "text", chars.size + 3,
      maxPieceLen = 4)
    assert(small.size === chars.size + 3)
  }

  test("fitTarget guards: target below alphabet, unreachable target") {
    val df = Seq((1L, "abc abc cab")).toDF("doc_id", "text")
    val eLow = intercept[IllegalArgumentException](
      Unigram.fitTarget(df, "text", 2, maxPieceLen = 3))
    assert(eLow.getMessage.contains("alphabet"))
    val eHigh = intercept[IllegalArgumentException](
      Unigram.fitTarget(df, "text", 5000, maxPieceLen = 3))
    assert(eHigh.getMessage.contains("cannot reach"))
  }

  test("guards") {
    val df = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](Unigram.fit(df, "text", -1))
    intercept[IllegalArgumentException](
      Unigram.encodeCol(col("text"), Seq.empty))
  }

  test("byte fallback: unseen characters decompose to <0xXX> pieces, " +
      "no [UNK]; covered text segments identically to the base model") {
    val base = Seq(Unigram.Piece("a", 3, 1), Unigram.Piece("b", 2, 2),
      Unigram.Piece("ab", 2, 2))
    val fb = Unigram.withByteFallback(base)
    assert(fb.size == base.size + 256)
    assert(fb.count(p =>
      graft.functions.UnigramEncodeExpr.isBytePiece(p.piece)) == 256)
    // every byte piece carries the max+8 penalty
    assert(fb.filter(p => graft.functions.UnigramEncodeExpr
      .isBytePiece(p.piece)).forall(_.costBits == 2 + 8))
    // "ab" covered → identical segmentation; "\u00e9" (C3 A9) and
    // "€" (E2 82 AC) unseen → byte pieces, never [UNK]
    val out = Seq((1L, "ab a\u00e9b \u20ac"))
      .toDF("doc_id", "text")
      .select(Unigram.encodeCol(col("text"), fb).as("p"))
      .head().getSeq[String](0)
    assert(out == Seq("ab", "a", "<0xC3>", "<0xA9>", "b",
      "<0xE2>", "<0x82>", "<0xAC>"))
    val covered = Seq((1L, "ab b a")).toDF("doc_id", "text")
    val withFb = covered.select(Unigram.encodeCol(col("text"), fb))
      .head().getSeq[String](0)
    val without = covered.select(Unigram.encodeCol(col("text"), base))
      .head().getSeq[String](0)
    assert(withFb == without, "fallback changed a covered segmentation")
    // a literal "<0x41>" in TEXT is ordinary characters, not a piece
    val lit41 = Seq((1L, "<0x41>")).toDF("doc_id", "text")
      .select(Unigram.encodeCol(col("text"), fb)).head().getSeq[String](0)
    assert(!lit41.contains("<0x41>") || lit41.length > 1,
      s"literal byte-piece text matched as one piece: $lit41")
    // ids cover the byte pieces through the sorted layout
    val ids = Seq((1L, "\u00e9")).toDF("doc_id", "text")
      .select(Unigram.encodeIdsCol(col("text"), fb)).head().getSeq[Int](0)
    assert(ids.length == 2 && ids.forall(_ > 0))
    // upgrading twice is rejected; partial byte tables are rejected
    intercept[IllegalArgumentException](Unigram.withByteFallback(fb))
    intercept[IllegalArgumentException] {
      Seq((1L, "x")).toDF("doc_id", "text")
        .select(Unigram.encodeCol(col("text"),
          base :+ Unigram.Piece("<0x00>", 0, 9))).collect()
    }
  }

  test("special tokens: atomic reserved ids N+1+k above the sorted " +
      "piece layout, case-exact through the lowercasing tokenizer") {
    val model = Seq(Unigram.Piece("a", 3, 1), Unigram.Piece("b", 2, 2),
      Unigram.Piece("ab", 2, 2)) // sorted: a→1, ab→2, b→3; N = 3
    val sp = Seq("<|doc|>", "<SEP>")
    val out = Seq((1L, "<|doc|> ab a<SEP>b"))
      .toDF("doc_id", "text")
      .select(Unigram.encodeIdsCol(col("text"), model, sp, 6).as("ids"))
      .head().getSeq[Int](0)
    // [<|doc|>=4] [ab=2] [a=1] [<SEP>=5] [b=3]
    assert(out === Seq(4, 2, 1, 5, 3))
    val plain = Seq((1L, "ab b")).toDF("doc_id", "text")
    val p1 = plain.select(
      Unigram.encodeIdsCol(col("text"), model, sp, 6)).head().getSeq[Int](0)
    val p2 = plain.select(
      Unigram.encodeIdsCol(col("text"), model)).head().getSeq[Int](0)
    assert(p1 === p2)
  }
}
