package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Preference

/** Preference-pair emitter: pairing, tie-breaks, margin floor,
  * degenerate-group handling. */
class PreferenceSpec extends AnyFunSuite {

  lazy val spark = Sessions.local()
  import spark.implicits._

  private def cand(rows: (Long, Long, String, Long)*) =
    rows.toDF("prompt_id", "resp_id", "text", "score_fp")

  test("chosen is max score, rejected is min score") {
    val out = Preference.preferencePairs(cand(
      (1L, 10L, "bad", 5L), (1L, 11L, "best", 90L), (1L, 12L, "mid", 40L)),
      "prompt_id", "resp_id", "text", "score_fp").collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("chosen_id") == 11L &&
      r.getAs[String]("chosen") == "best")
    assert(r.getAs[Long]("rejected_id") == 10L &&
      r.getAs[String]("rejected") == "bad")
    assert(r.getAs[Long]("margin_fp") == 85L &&
      r.getAs[Long]("n_candidates") == 3L)
  }

  test("fully-tied group still yields a distinct pair (id tie-breaks)") {
    val out = Preference.preferencePairs(cand(
      (1L, 10L, "a", 7L), (1L, 11L, "b", 7L), (1L, 12L, "c", 7L)),
      "prompt_id", "resp_id", "text", "score_fp", minMarginFp = 0L)
      .collect()
    assert(out.length == 1)
    // chosen: smallest id at max score; rejected: largest id at min
    assert(out.head.getAs[Long]("chosen_id") == 10L)
    assert(out.head.getAs[Long]("rejected_id") == 12L)
    assert(out.head.getAs[Long]("margin_fp") == 0L)
  }

  test("margin floor and singleton groups drop") {
    val out = Preference.preferencePairs(cand(
      (1L, 10L, "a", 5L), (1L, 11L, "b", 14L),   // margin 9 < 10 → drop
      (2L, 20L, "c", 5L), (2L, 21L, "d", 50L),   // margin 45 → keep
      (3L, 30L, "e", 99L)),                      // singleton → drop
      "prompt_id", "resp_id", "text", "score_fp", minMarginFp = 10L)
      .collect()
    assert(out.map(_.getAs[Long]("prompt_id")).toSeq === Seq(2L))
  }

  test("default margin of 1 drops exactly-tied pairs") {
    val out = Preference.preferencePairs(cand(
      (1L, 10L, "a", 7L), (1L, 11L, "b", 7L),
      (2L, 20L, "c", 7L), (2L, 21L, "d", 8L)),
      "prompt_id", "resp_id", "text", "score_fp").collect()
    assert(out.map(_.getAs[Long]("prompt_id")).toSeq === Seq(2L))
  }

  test("negative minMarginFp rejected") {
    intercept[IllegalArgumentException](
      Preference.preferencePairs(cand((1L, 1L, "x", 1L)),
        "prompt_id", "resp_id", "text", "score_fp", minMarginFp = -1L))
  }
}
