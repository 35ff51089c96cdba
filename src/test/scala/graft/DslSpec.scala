package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.hb.{Ast, HbParser, Printer}
import graft.hb.Dsl
import Ast._

/** The Scala combinator DSL + print/parse round-trip property.
  * Mirrors the reference's parse-at-construction validation
  * (tools/workbench/src/Types.fs:143-157). */
class DslSpec extends AnyFunSuite {

  lazy val spark = Sessions.local()

  test("DSL builds, validates and runs a Velocity-shaped chain") {
    import Dsl._
    val t = transformation(
      only(c("State") !== s("Todo")),
      groupBy("Sprint", "Item").maxby(c("Changed")),
      pivot(c("Sprint"), c("State")).count(c("Item")),
      sortBy("Sprint"),
      create("m", moving(mean, 2, c("Done"))),
      slice("Sprint", "Done", "m"))
    assert(t.toHb.startsWith("only ((State != 'Todo'))"))
    val src = graft.sources.Ingest.localData(spark,
      Seq("Sprint", "Item", "State", "Changed"),
      Seq(Seq("S1", 1L, "Done", "d2"), Seq("S1", 1L, "Doing", "d1"),
        Seq("S2", 2L, "Done", "d3")))
    assert(t.run(src).count() == 2)
  }

  test("extension statements build, round-trip and run") {
    import Dsl._
    val tr = transformation(
      indexBy(c("id")),
      dedupExact("txt"),
      splitSalted("id", "s1", 80, 10, 10),
      pack("ntok", 128, 4),
      create("id", keys))
    assert(tr.toHb.contains("dedup exact txt"))
    assert(tr.toHb.contains("split 80/10/10 by id 's1'"))
    assert(tr.toHb.contains("pack ntok 128 4"))
    val src = graft.sources.Ingest.localData(spark,
      Seq("id", "txt", "ntok"),
      Seq(Seq(1L, "a b", 10L), Seq(2L, "a  b", 20L), Seq(3L, "c", 30L)))
    val out = tr.run(src)
    // "a  b" normalizes to "a b" → doc 2 is the exact-dup, dropped
    assert(out.columns.toSet ==
      Set("id", "shard", "seq_first", "seq_last", "seq_offset"))
    assert(out.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 3L))
  }

  test("chunk statement builds, round-trips and runs") {
    import Dsl._
    val tr = transformation(
      indexBy(c("id")),
      chunk("txt", 3, 2),
      create("id", keys))
    assert(tr.toHb.contains("chunk txt 3 2"))
    val src = graft.sources.Ingest.localData(spark,
      Seq("id", "txt"),
      Seq(Seq(1L, "a b c d e"), Seq(2L, "x y")))
    val out = tr.run(src)
    // doc 1: 5 tokens, starts 0,2,4; doc 2: 2 tokens, start 0
    assert(out.count() == 4)
    assert(out.columns.contains("chunk_id") &&
      out.columns.contains("chunk_md5"))
  }

  test("DSL rejects non-round-trippable constructions") {
    import Dsl._
    intercept[Exception] {
      transformation(create("bad\"name", n(1)))
    }
  }

  // ---------------- ScalaCheck: random AST → print → parse → same AST

  private val genName: Gen[String] = for {
    h <- Gen.alphaChar
    t <- Gen.listOfN(5, Gen.oneOf(Gen.alphaNumChar, Gen.const('_')))
  } yield (h :: t).mkString

  private val genRed: Gen[Reduction] = Gen.oneOf(Reduction.all)
  private val genPart: Gen[DatePart] = Gen.oneOf(DatePart.all)

  private def genExpr(depth: Int): Gen[Expr] = {
    val leaf: Gen[Expr] = Gen.oneOf(
      genName.map(ColRef),
      Gen.alphaNumStr.map(s => StrLit(s.take(8))),
      Gen.chooseNum(0, 99999).map(i => NumLit(i.toDouble)),
      Gen.chooseNum(1, 999).map(i => NumLit(i / 100.0)),
      Gen.const(MissingLit), Gen.const(KeysExpr), Gen.const(OrdinalsExpr))
    if (depth <= 0) leaf
    else {
      val sub = genExpr(depth - 1)
      Gen.frequency(
        4 -> leaf,
        3 -> (for {
          op <- Gen.oneOf("=", "!=", ">", "<", ">=", "<=", "+", "-", "*",
            "/", "&&", "||")
          l <- sub; r <- sub
        } yield Bin(op, l, r)),
        1 -> sub.map(Not(_)),
        1 -> (for { cnd <- sub; t <- sub; f <- sub }
          yield IfElse(cnd, t, f)),
        1 -> sub.map(IntCast(_)),
        1 -> (for { k <- Gen.oneOf(TextSigKind.all); e <- sub }
          yield TextSig(k, e)),
        1 -> (for { e <- sub; vs <- Gen.nonEmptyListOf(
          Gen.oneOf(Gen.alphaNumStr.map(s => StrLit(s.take(6))),
            Gen.chooseNum(0, 999).map(i => NumLit(i.toDouble)))) }
          yield Contains(e, vs.take(3))),
        1 -> (for { e <- sub; g <- Gen.chooseNum(1, 3) }
          yield RegexExtract(e, "[Ss]print ([0-9]+)", Seq(GroupTok(g)))),
        1 -> (for { nm <- genName; p <- genPart }
          yield FormatDate(ColRef(nm), p)),
        1 -> (for { r <- genRed; w <- Gen.chooseNum(2, 30); e <- sub }
          yield Moving(r, w, e)),
        1 -> (for { r <- genRed; e <- sub } yield Expanding(r, e)),
        1 -> (for { x <- sub; y <- sub } yield LinReg(x, y)))
    }
  }

  private val genStatement: Gen[Statement] = Gen.oneOf(
    for { nm <- genName; e <- genExpr(2) } yield CreateColumn(nm, e),
    for { a <- genName; b <- genName } yield RenameColumn(a, b),
    Gen.nonEmptyListOf(genName).map(ns => SliceColumns(ns.take(4))),
    genExpr(2).map(Only),
    Gen.const(DenseRows), Gen.const(DenseColumns),
    Gen.const(NumericColumns),
    genExpr(2).map(IndexBy),
    genName.map(SortByColumn),
    for { cols <- Gen.nonEmptyListOf(genName); r <- genRed }
      yield GroupBy(cols.take(3), RowsBy(r)),
    for { ts <- genName; m <- Gen.chooseNum(1, 1440);
      d <- Gen.oneOf(0, 15, 60); cols <- Gen.nonEmptyListOf(genName);
      r <- genRed }
      yield WindowAgg(ts, m, d, cols.take(3), r),
    for { cols <- Gen.nonEmptyListOf(genName); e <- genExpr(1) }
      yield GroupBy(cols.take(3), MaxBy(e)),
    for { r <- genExpr(1); cl <- genExpr(1); red <- genRed; v <- genExpr(1);
      vals <- Gen.listOf(Gen.oneOf(
        Gen.alphaNumStr.map(s => StrLit(s.take(6))),
        Gen.chooseNum(0, 999).map(i => NumLit(i.toDouble)))) }
      yield Pivot(r, cl, red, v, vals.take(3)),
    for { nb <- Gen.chooseNum(2, 16); r <- genRed } yield Buckets(nb, r),
    for { k <- Gen.chooseNum(2, 8); r <- genRed }
      yield KMeansCluster(k, r),
    genRed.map(Each),
    for { nm <- genName; e <- genExpr(1); p <- Gen.chooseNum(1, 20);
      t <- Gen.chooseNum(2, 50) } yield LinearExtrapolation(nm, e, p, t),
    // training-pipeline extension statements
    genName.map(DedupExact),
    for { nm <- genName; th <- Gen.chooseNum(1, 99) }
      yield DedupMinhash(nm, th / 100.0),
    for { nm <- genName; h <- Gen.chooseNum(0, 8) }
      yield DedupSimhash(nm, h),
    for { nm <- genName; th <- Gen.chooseNum(1, 99) }
      yield ClusterMinhash(nm, th / 100.0),
    for { nm <- genName; tr <- Gen.chooseNum(50, 98);
      va <- Gen.chooseNum(1, 99 - tr); threeWay <- Gen.oneOf(true, false);
      salt <- Gen.oneOf("split", "s1", "seed42") }
      yield SplitBy(
        if (threeWay) Seq(tr.toDouble, va.toDouble, (100 - tr - va).toDouble)
        else Seq(tr.toDouble, (100 - tr).toDouble), nm, salt),
    for { nm <- genName; b <- Gen.chooseNum(128, 8192);
      sh <- Gen.oneOf(64, 8, 16) } yield Pack(nm, b.toLong, sh),
    for { nm <- genName; w <- Gen.chooseNum(2, 4096);
      full <- Gen.oneOf(true, false); st <- Gen.chooseNum(1, 4096) }
      yield Chunk(nm, w, if (full) math.min(st, w) else w),
    for { nm <- genName; pct <- Gen.chooseNum(1, 99);
      salt <- Gen.oneOf("sample", "s1") }
      yield SampleBy(pct.toDouble, nm, salt),
    for { nm <- genName; k <- Gen.chooseNum(1, 3);
      pairs <- Gen.listOfN(k,
        for { s2 <- genName; v <- Gen.chooseNum(1, 100) }
          yield (s2, v.toDouble));
      d <- Gen.chooseNum(0, 99); salt <- Gen.oneOf("mix", "m1") }
      yield MixBy(nm, pairs, d.toDouble, salt),
    for { k <- Gen.chooseNum(1, 50); v <- genName; e <- genExpr(1);
      mode <- Gen.oneOf[AnnIndex](AnnIndex.Exact,
        AnnIndex.Pq(8), AnnIndex.Pq(4), AnnIndex.Ivf(16),
        AnnIndex.Mmr(7), AnnIndex.Mmr(0)) }
      yield Neighbors(k, ColRef(v), e, mode),
    for { nm <- genName; k <- Gen.oneOf(8, 4, 50) } yield Scrub(nm, k),
    for { nm <- genName; n <- Gen.chooseNum(1, 65536) }
      yield Encode(nm, n),
    for { k <- Gen.chooseNum(1, 50); sc <- genName; st <- genName }
      yield TopBy(k, sc, st),
    for { p2 <- Gen.chooseNum(1, 100); sc <- genName; st <- genName }
      yield TopFracBy(p2, sc, st),
    for { nm <- genName; n <- Gen.chooseNum(1, 512) }
      yield BpeEnc(nm, n),
    for { nm <- genName; k <- Gen.chooseNum(1, 3)
      pairs <- Gen.listOfN(k,
        for { s2 <- genName; v <- Gen.chooseNum(1, 100) }
          yield (s2, v.toDouble))
      salt <- Gen.oneOf("rebalance", "r1")
      w <- Gen.option(genName) }
      yield RebalanceBy(nm, pairs, salt, w),
    for { salt <- Gen.oneOf("epoch", "ep1") } yield Shuffle(salt),
    for { n <- Gen.chooseNum(1, 1024) } yield Shards(n),
    for { c <- genName; b <- Gen.chooseNum(1, 100)
      salt <- Gen.oneOf("curriculum", "c1") }
      yield Curriculum(c, b, salt),
    for { nm <- genName; k <- Gen.chooseNum(1, 3)
      pairs <- Gen.listOfN(k,
        for { s2 <- genName;
          v <- Gen.oneOf(0.0, 0.5, 1.0, 2.5, 12.25, 3.0) }
          yield (s2, v))
      salt <- Gen.oneOf("upsample", "u1") }
      yield Upsample(nm, pairs, salt),
    for { nm <- genName; w <- genName; k <- Gen.chooseNum(1, 3)
      pairs <- Gen.listOfN(k,
        for { s2 <- genName; v <- Gen.chooseNum(1, 100) }
          yield (s2, v.toDouble))
      b <- Gen.chooseNum(100L, 100000L)
      salt <- Gen.oneOf("upsample", "u2") }
      yield Upsample(nm, pairs, salt, Some(w -> b)),
    for { k <- Gen.chooseNum(1, 50); nm <- genName }
      yield Diverse(k, ColRef(nm)),
    for { c <- genName; conf <- genName
      b <- Gen.oneOf(4096, 1024); s <- Gen.oneOf("lm", "s1") }
      yield ScoreUsing(c, conf, b, s),
    for { c <- genName; p <- genName; n <- genName
      b <- Gen.oneOf(4096, 512); s <- Gen.oneOf("nb", "c1") }
      yield ClassifyUsing(c, p, n, b, s),
    for { c <- genName; conf <- genName; n <- Gen.chooseNum(1, 100000) }
      yield EncodeUsing(c, conf, n),
    for { c <- genName; conf <- genName; n <- Gen.chooseNum(1, 100000) }
      yield DecodeUsing(c, conf, n),
    for { c <- genName; conf <- genName; n <- Gen.chooseNum(1, 32768) }
      yield BpeUsing(c, conf, n),
    // r11 forms
    for { nm <- genName; n <- Gen.chooseNum(1, 32768) }
      yield BpeBytesEnc(nm, n),
    for { c <- genName; conf <- genName; n <- Gen.chooseNum(1, 32768) }
      yield BpeBytesUsing(c, conf, n),
    for { nm <- genName } yield BpeBytesDecode(nm),
    for { nm <- genName; b <- Gen.chooseNum(1L, 100000L)
      sh <- Gen.oneOf(64, 8) }
      yield PackBins(nm, b, sh),
    for { nm <- genName; b <- Gen.chooseNum(1L, 100000L)
      sh <- Gen.oneOf(64, 4) }
      yield EmitPacked(nm, b, sh),
    for { nm <- genName; b <- Gen.chooseNum(1L, 100000L)
      sh <- Gen.oneOf(64, 4) }
      yield EmitAligned(nm, b, sh))

  test("property: every statement round-trips print → parse") {
    val params = org.scalacheck.Gen.Parameters.default
    (1 to 500).foreach { i =>
      genStatement(params, org.scalacheck.rng.Seed(i.toLong)).foreach { st =>
        val printed = Printer.print(st)
        assert(HbParser.parseStatement(printed) == st,
          s"seed $i printed as: $printed")
      }
    }
  }
}
