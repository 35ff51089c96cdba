package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Chunking, Decontaminate}

/** Decontamination + chunking semantics on hand-built corpora where the
  * expected flags/layout are enumerable by eye.
  */
class TextPrepSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Sessions.local()
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("decontaminate flags exactly the docs sharing an n-gram") {
    val corpus = docs(
      1L -> "the quick brown fox jumps over the dog",
      2L -> "entirely different words appear here now",
      3L -> "ends with quick brown fox jumps")
    val eval = docs(
      100L -> "a quick brown fox jumps far away")
    val out = Decontaminate.flag(corpus, eval, "doc_id", "text", n = 4)
      .select("doc_id", "contaminated")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    // "quick brown fox jumps" is the shared 4-gram of docs 1 and 3.
    assert(out == Map(1L -> true, 2L -> false, 3L -> true))
  }

  test("decontaminate matching is case/whitespace-normalized") {
    val corpus = docs(1L -> "Alpha  Beta\tGamma Delta tail")
    val eval = docs(9L -> "alpha beta gamma delta")
    val out = Decontaminate.flag(corpus, eval, "doc_id", "text", n = 4)
      .select("contaminated").head().getBoolean(0)
    assert(out)
  }

  test("docs shorter than n never match; clean drops flagged docs") {
    val corpus = docs(1L -> "too short", 2L -> "one two three four")
    val eval = docs(9L -> "too short", 10L -> "one two three four")
    val flags = Decontaminate.flag(corpus, eval, "doc_id", "text", n = 4)
      .select("doc_id", "contaminated")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(flags == Map(1L -> false, 2L -> true))
    val kept = Decontaminate.clean(corpus, eval, "doc_id", "text", n = 4)
      .select("doc_id").as[Long].collect().toSeq
    assert(kept == Seq(1L))
  }

  test("chunk layout covers every token and respects window/stride") {
    // 10 tokens, window 4, stride 3 → starts 0,3,6,9; lengths 4,4,4,1.
    val d = docs(1L -> (1 to 10).map(i => s"t$i").mkString(" "))
    val rows = Chunking.chunkLayout(d, "doc_id", "text", window = 4,
      stride = 3).orderBy("chunk_id")
      .select("chunk_id", "tok_start", "n_chunk_tokens")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == Seq((0L, 0L, 4L), (1L, 3L, 4L), (2L, 6L, 4L),
      (3L, 9L, 1L)))
  }

  test("stride == window gives a disjoint partition of the tokens") {
    val d = docs(1L -> (1 to 9).map(i => s"t$i").mkString(" "))
    val rows = Chunking.chunkLayout(d, "doc_id", "text", window = 3,
      stride = 3).select("tok_start", "n_chunk_tokens")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.toSeq.sorted == Seq((0L, 3L), (3L, 3L), (6L, 3L)))
    assert(rows.map(_._2).sum == 9) // total coverage, no overlap
  }

  test("chunking a single-token doc yields one chunk") {
    val rows = Chunking.chunkLayout(docs(1L -> "solo"), "doc_id", "text",
      window = 64, stride = 48).collect()
    assert(rows.length == 1)
  }

  test("passage dedup counts cross-doc repeated windows, not unique ones") {
    import graft.operators.PassageDedup
    // docs 1 and 2 share the 4-token passage "w x y z" inside otherwise
    // different texts; doc 3 shares nothing.
    val corpus = docs(
      1L -> "a b c w x y z d e",
      2L -> "p q w x y z r s t",
      3L -> "m n o u v k l")
    val stats = PassageDedup.docStats(corpus, "doc_id", "text", k = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    // doc 1: 6 windows, exactly 1 repeated ("w x y z"); same for doc 2.
    assert(stats(1L) == ((6L, 1L)))
    assert(stats(2L) == ((6L, 1L)))
    assert(stats(3L) == ((4L, 0L)))
    val rep = PassageDedup.repeatedPassages(corpus, "doc_id", "text", k = 4)
      .collect()
    assert(rep.length == 1 && rep.head.getLong(1) == 2 // n_docs
      && rep.head.getLong(2) == 2) // n_occ
  }

  test("scrub removes exactly the tokens covered by repeated windows") {
    import graft.operators.PassageDedup
    val corpus = docs(
      1L -> "a b c w x y z d e",
      2L -> "p q w x y z r s t",
      3L -> "m n o u v k l")
    val out = PassageDedup.scrub(corpus, "doc_id", "text", k = 4)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("scrubbed"), r.getAs[Long]("n_removed")))).toMap
    // the shared "w x y z" window goes from BOTH docs (all copies);
    // surrounding unique tokens survive in order
    assert(out(1L) == (("a b c d e", 4L)))
    assert(out(2L) == (("p q r s t", 4L)))
    assert(out(3L) == (("m n o u v k l", 0L)))
  }

  test("scrubAgainst removes exactly the eval-quoted windows from the " +
      "train side and leaves clean docs untouched") {
    import graft.operators.PassageDedup
    val train = docs(
      1L -> "intro words w x y z closing remark",  // quotes the eval item
      2L -> "completely unrelated training text here")
    val eval = docs(10L -> "w x y z")
    val out = PassageDedup.scrubAgainst(train, "doc_id", "text",
      eval, "doc_id", "text", k = 4)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("scrubbed"), r.getAs[Long]("n_removed")))).toMap
    assert(out(1L) == (("intro words closing remark", 4L)))
    assert(out(2L) == (("completely unrelated training text here", 0L)))
    // removal is one-sided: the eval frame itself is never rewritten
    assert(!out.contains(10L))
  }

  test("within-doc repetition also counts as repeated passage mass") {
    import graft.operators.PassageDedup
    val corpus = docs(1L -> "x y x y x y x y") // "x y x y" repeats inside
    val rep = PassageDedup.repeatedPassages(corpus, "doc_id", "text", k = 4)
      .collect()
    assert(rep.nonEmpty && rep.forall(_.getLong(1) == 1)) // one doc
    assert(rep.map(_.getLong(2)).sum >= 4) // multiple occurrences
  }

  test("winnowed windows are a content-stable subset of the full set") {
    import graft.operators.PassageDedup
    val corpus = docs(
      1L -> (1 to 200).map(i => s"tok${i % 37}").mkString(" "),
      2L -> (1 to 150).map(i => s"tok${i % 23}").mkString(" "))
    val full = PassageDedup.windows(corpus, "doc_id", "text", k = 4)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val sampled = PassageDedup.windows(corpus, "doc_id", "text", k = 4,
      sampleMod = 4).collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(sampled.subsetOf(full))
    assert(sampled.size < full.size && sampled.nonEmpty)
    // selection is by digest, so the SAME passages are kept everywhere:
    // fingerprints selected in doc 1 are selected in doc 2 too
    val fp1 = sampled.filter(_._1 == 1L).map(_._2)
    val both = full.filter(_._1 == 2L).map(_._2).intersect(fp1)
    assert(both.forall(fp => sampled.contains((2L, fp))))
  }

  test("property: chunk layout covers all tokens, starts step by stride") {
    import org.scalacheck.Gen
    val gen = for {
      n <- Gen.chooseNum(1, 300)
      w <- Gen.chooseNum(1, 80)
      s <- Gen.chooseNum(1, w)
    } yield (n, w, s)
    val params = org.scalacheck.Gen.Parameters.default
    (1 to 30).foreach { i =>
      gen(params, org.scalacheck.rng.Seed(i.toLong)).foreach {
        case (n, w, s) =>
          val d = docs(1L -> (1 to n).map(j => s"t$j").mkString(" "))
          val rows = Chunking.chunkLayout(d, "doc_id", "text", w, s)
            .select("tok_start", "n_chunk_tokens")
            .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
          // starts are exactly the multiples of stride below n
          assert(rows.map(_._1).toSeq ==
            (0L until n.toLong by s.toLong).toSeq,
            s"n=$n w=$w s=$s starts=${rows.map(_._1).toSeq}")
          // every token is inside at least one chunk; no chunk overruns
          val covered = rows.flatMap { case (st, len) =>
            st until (st + len) }.toSet
          assert(covered == (0L until n.toLong).toSet, s"n=$n w=$w s=$s")
          assert(rows.forall { case (st, len) =>
            len >= 1 && len <= w && st + len <= n }, s"n=$n w=$w s=$s")
      }
    }
  }

  test("decontamination is monotone: smaller n flags a superset") {
    // sharing an n-gram implies sharing every (n-1)-gram inside it, so
    // shrinking n can only ADD flags — the knob is safe to tighten.
    val corpus = docs(
      1L -> "alpha beta gamma delta epsilon zeta",
      2L -> "one two three alpha beta gamma end",
      3L -> "unrelated words only here today now")
    val eval = docs(9L -> "alpha beta gamma delta")
    def flagged(n: Int) =
      Decontaminate.flag(corpus, eval, "doc_id", "text", n)
        .filter(col("contaminated")).select("doc_id")
        .as[Long].collect().toSet
    val f2 = flagged(2); val f3 = flagged(3); val f4 = flagged(4)
    assert(f4.subsetOf(f3) && f3.subsetOf(f2))
    assert(f4 == Set(1L)) // only doc 1 shares a full 4-gram
    assert(f3 == Set(1L, 2L)) // doc 2 shares "alpha beta gamma"
  }

  test("winnowed passage stats are bounded by the exhaustive stats") {
    import graft.operators.PassageDedup
    val corpus = docs(
      1L -> ((1 to 100).map(j => s"t${j % 11}").mkString(" ")),
      2L -> ((1 to 100).map(j => s"t${j % 11}").mkString(" ")))
    def stats(mod: Int) =
      PassageDedup.docStats(corpus, "doc_id", "text", k = 4, sampleMod = mod)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
    val full = stats(1); val sampled = stats(4)
    sampled.foreach { case (id, (nw, nr)) =>
      assert(nw <= full(id)._1 && nr <= full(id)._2)
      assert(nr <= nw)
    }
    // identical docs: every window fingerprint occurs twice, so ALL
    // (sampled) windows are repeated in both views
    full.foreach { case (_, (nw, nr)) => assert(nw == nr) }
    sampled.foreach { case (_, (nw, nr)) => assert(nw == nr) }
  }

  test("null text: chunking emits no rows, decontaminate flags false, " +
    "passage stats are zero-windows") {
    import graft.operators.PassageDedup
    val corpus = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(1L, "alpha beta gamma delta"),
        org.apache.spark.sql.Row(2L, null))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType, nullable = true))))
    // chunking: a null text has no tokens — zero chunk rows, not a crash
    val chunks = Chunking.chunkLayout(corpus, "doc_id", "text", 4, 2)
    assert(chunks.filter(col("doc_id") === 2L).count() == 0)
    assert(chunks.filter(col("doc_id") === 1L).count() > 0)
    // decontaminate: a null text shares no grams — flagged false
    val eval = docs(9L -> "alpha beta gamma delta")
    val flags = Decontaminate.flag(corpus, eval, "doc_id", "text", n = 4)
      .select("doc_id", "contaminated")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(flags == Map(1L -> true, 2L -> false))
    // passage stats: null text contributes zero windows, null fraction
    val st = PassageDedup.docStats(corpus, "doc_id", "text", k = 2)
      .filter(col("doc_id") === 2L).head()
    assert(st.getLong(1) == 0L && st.getLong(2) == 0L && st.isNullAt(3))
  }

  test("neither operator shuffles the corpus for its narrow stages") {
    // Chunking: zero exchanges at all.
    val chunkPlan = Chunking.chunkLayout(docs(1L -> "a b c"), "doc_id",
      "text", 4, 2).queryExecution.executedPlan.toString
    assert(!chunkPlan.contains("Exchange"),
      s"chunk plan should be shuffle-free:\n$chunkPlan")
    // Decontaminate: the eval-gram membership test must be a broadcast
    // join (the corpus-gram side never hash-partitions for it).
    val plan = Decontaminate.flag(docs(1L -> "a b c d e"),
      docs(9L -> "a b c d"), "doc_id", "text", n = 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastExchange"),
      s"eval grams should broadcast:\n$plan")
  }
}
