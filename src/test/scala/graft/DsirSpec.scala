package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Dsir

/** DSIR importance selection: direction of the evidence, bucketed-
  * feature path, determinism, and the selection contract. */
class DsirSpec extends AnyFunSuite {

  lazy val spark = Sessions.local()
  import spark.implicits._

  // target talks about cats; raw is a mixed bag
  private def target = Seq(
    (1L, "cat cat feline cat"), (2L, "cat feline purr"))
    .toDF("id", "text")
  private def raw = Seq(
    (10L, "cat feline cat purr"),   // target-like
    (11L, "dog kennel bark dog"),   // off-target
    (12L, "cat dog mixed bag"),
    (13L, "stock market index fund"))
    .toDF("id", "text")

  test("target-like documents outscore off-target ones") {
    val scores = Dsir.importanceScores(raw, target, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(scores(10L) > scores(12L))
    assert(scores(12L) > scores(11L))
    assert(scores.keySet == Set(10L, 11L, 12L, 13L))
  }

  test("select keeps ceil(pct% * n) rows, best scores first") {
    val kept = Dsir.select(raw, target, "id", "text", pct = 50)
    assert(kept.count() == 2)
    assert(kept.select("id").as[Long].collect().toSet == Set(10L, 12L))
    assert(kept.columns.contains("score_fp"))
  }

  test("bucketed features: model is bounded by B and direction holds") {
    val b = 16
    val scores = Dsir.importanceScores(raw, target, "id", "text", buckets = b)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(scores(10L) > scores(11L))
    // two runs are bit-identical (hash features are deterministic)
    val again = Dsir.importanceScores(raw, target, "id", "text", buckets = b)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(scores == again)
  }

  test("null-text raw documents rank last with a null score") {
    val withNull = raw.union(Seq((14L, null.asInstanceOf[String]))
      .toDF("id", "text"))
    val kept = Dsir.select(withNull, target, "id", "text", pct = 100)
    assert(kept.count() == 5)
    val nullRow = kept.filter(col("id") === 14L).collect()
    assert(nullRow.length == 1 && nullRow(0).isNullAt(
      kept.columns.indexOf("score_fp")))
  }

  test("invalid arguments are rejected loudly") {
    intercept[IllegalArgumentException] {
      Dsir.select(raw, target, "id", "text", pct = 0)
    }
    intercept[IllegalArgumentException] {
      Dsir.importanceScores(raw, target, "id", "text", buckets = -1)
    }
  }
}
