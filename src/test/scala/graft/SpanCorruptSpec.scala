package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.SpanCorrupt

/** Span corruption: mask/sentinel structure, run merging, empty docs,
  * reserved-name guard. The exact mask layout is hash-driven and
  * oracle-pinned (t_span_corrupt); here we assert the structural
  * invariants that hold for any layout. */
class SpanCorruptSpec extends AnyFunSuite {

  lazy val spark = Sessions.local()
  import spark.implicits._

  private def run(rows: (Long, String)*) =
    SpanCorrupt.corrupt(rows.toDF("doc_id", "text"), "doc_id", "text",
      rateK = 3).collect()

  test("structure: sentinels are dense from 0; tgt token count = " +
    "n_masked + runs; inp+tgt tokens reconstruct the doc") {
    val text = (1 to 60).map(i => s"w$i").mkString(" ")
    val out = run(1L -> text).head
    val inp = out.getAs[String]("inp").split(" ").filter(_.nonEmpty)
    val tgt = out.getAs[String]("tgt").split(" ").filter(_.nonEmpty)
    val nm = out.getAs[Long]("n_masked")
    val sentsInp = inp.filter(_.startsWith("<extra_id_"))
    val sentsTgt = tgt.filter(_.startsWith("<extra_id_"))
    assert(nm > 0, "rateK=3 over 60 tokens should mask something")
    // each run contributes exactly one sentinel to BOTH streams, in
    // the same dense order 0..k
    assert(sentsInp.toSeq === sentsTgt.toSeq)
    assert(sentsInp.toSeq ===
      sentsInp.indices.map(k => s"<extra_id_$k>"))
    assert(tgt.length == nm + sentsTgt.length)
    // removing sentinels and interleaving reconstructs the original
    assert(inp.count(!_.startsWith("<extra_id_")) + nm == 60)
    val masked = tgt.filter(!_.startsWith("<extra_id_")).toSet
    val kept = inp.filter(!_.startsWith("<extra_id_")).toSet
    assert((masked ++ kept) == (1 to 60).map(i => s"w$i").toSet)
    assert(masked.intersect(kept).isEmpty)
  }

  test("empty and null text") {
    val out = SpanCorrupt.corrupt(
      Seq((1L, ""), (2L, null.asInstanceOf[String]), (3L, "one"))
        .toDF("doc_id", "text"), "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out(0).getAs[String]("inp") == "" &&
      out(0).getAs[Long]("n_masked") == 0L)
    assert(out(1).isNullAt(out(1).fieldIndex("inp")))
    assert(out(2).getAs[String]("inp").nonEmpty ||
      out(2).getAs[String]("tgt").nonEmpty)
  }

  test("determinism and reserved-name guard") {
    val text = (1 to 30).map(i => s"t$i").mkString(" ")
    assert(run(7L -> text).head.getAs[String]("inp") ==
      run(7L -> text).head.getAs[String]("inp"))
    intercept[IllegalArgumentException] {
      SpanCorrupt.corrupt(
        Seq((1L, "x")).toDF("doc_id", "text")
          .withColumn("inp", lit("")), "doc_id", "text")
    }
    intercept[IllegalArgumentException] {
      SpanCorrupt.corrupt(
        Seq((1L, "x")).toDF("doc_id", "text"), "doc_id", "text",
        rateK = 1)
    }
  }

  test("fim: PSM layout reconstructs the document exactly, rate edges " +
      "pass through / always apply, null text stays null") {
    val docs = Seq((7L, "a b c d e f"), (8L, null.asInstanceOf[String]),
      (9L, "  ")).toDF("doc_id", "text")
    // fimPermille = 1000: every non-null doc transforms
    val all = SpanCorrupt.fim(docs, "doc_id", "text", fimPermille = 1000)
      .select("doc_id", "fim", "fim_applied", "n_tokens")
      .orderBy("doc_id").collect()
    val f7 = all(0).getString(1)
    assert(f7.startsWith("<PRE>") && f7.contains("<SUF>") &&
      f7.contains("<MID>"), f7)
    // the three segments concatenate (in P/S/M order unscrambled back
    // to P/M/S) to the original token stream
    val pre = f7.substring("<PRE>".length, f7.indexOf("<SUF>")).trim
    val suf = f7.substring(f7.indexOf("<SUF>") + 5, f7.indexOf("<MID>")).trim
    val mid = f7.substring(f7.indexOf("<MID>") + 5).trim
    assert(Seq(pre, mid, suf).filter(_.nonEmpty).mkString(" ")
      === "a b c d e f")
    assert(all(0).getBoolean(2) && all(0).getLong(3) == 6L)
    // null text: all outputs null
    assert(all(1).isNullAt(1) && all(1).isNullAt(2) && all(1).isNullAt(3))
    // whitespace-only doc: empty segments, zero tokens
    assert(all(2).getString(1) === "<PRE> <SUF> <MID>")
    assert(all(2).getLong(3) == 0L)
    // fimPermille = 0: verbatim normalized pass-through
    val none = SpanCorrupt.fim(docs, "doc_id", "text", fimPermille = 0)
      .select("doc_id", "fim", "fim_applied", "n_tokens")
      .orderBy("doc_id").collect()
    assert(none(0).getString(1) === "a b c d e f")
    assert(!none(0).getBoolean(2))
    // guards
    intercept[IllegalArgumentException] {
      SpanCorrupt.fim(docs, "doc_id", "text", fimPermille = 1001)
    }
    intercept[IllegalArgumentException] {
      SpanCorrupt.fim(docs.withColumn("fim", lit("")), "doc_id", "text")
    }
  }

  test("null id RAISES in both the native pass and the spec fold " +
      "(the hash32 null-id discipline — never silent null outputs)") {
    val docs = Seq((1L, "a b c"), (2L, "d e f")).toDF("doc_id", "text")
      .withColumn("doc_id",
        when(col("doc_id") === 2L, lit(null).cast("long"))
          .otherwise(col("doc_id")))
    val eNative = intercept[Exception] {
      SpanCorrupt.corrupt(docs, "doc_id", "text").collect()
    }
    assert(exceptionChain(eNative).exists(_.getMessage != null) &&
      exceptionChain(eNative).exists(m => m.getMessage != null &&
        m.getMessage.contains("null id")), eNative.toString)
    val eSpec = intercept[Exception] {
      SpanCorrupt.corruptSpec(docs, "doc_id", "text").collect()
    }
    assert(exceptionChain(eSpec).exists(m => m.getMessage != null &&
      m.getMessage.contains("null id")), eSpec.toString)
  }

  private def exceptionChain(e: Throwable): Seq[Throwable] =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(8).toSeq

  test("native corrupt pass is bit-identical to the Catalyst-HOF " +
      "specification fold (random docs, rate edges, empty/whitespace)") {
    val rnd = new scala.util.Random(37)
    val pool = Array("spark", "scan", "agg", "row", "42", "x,y", "end.")
    val docs = (Seq.tabulate(120)(i =>
      (i.toLong, (0 until rnd.nextInt(40))
        .map(_ => pool(rnd.nextInt(pool.length))).mkString(" "))) ++
      Seq((900L, ""), (901L, "   "), (902L, "one")))
      .toDF("doc_id", "text")
    for (rateK <- Seq(2, 6)) {
      val a = SpanCorrupt.corrupt(docs, "doc_id", "text", rateK)
        .select("doc_id", "inp", "tgt", "n_masked")
        .orderBy("doc_id").collect()
      val b = SpanCorrupt.corruptSpec(docs, "doc_id", "text", rateK)
        .select("doc_id", "inp", "tgt", "n_masked")
        .orderBy("doc_id").collect()
      a.zip(b).foreach { case (x, y) =>
        assert(x == y, s"rateK=$rateK diverged: $x vs $y")
      }
    }
  }
}
