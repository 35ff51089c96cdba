package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Drift

/** Drift report semantics the oracle can't see: planted movers surface
  * in the right direction, and the report is partitioning-invariant. */
class DriftSpec extends AnyFunSuite {

  lazy val spark = Sessions.local()
  import spark.implicits._

  private val common = (1 to 40).map(i => s"stable word number $i")
  private def df(extra: Seq[String]) =
    (common ++ extra).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")

  test("planted movers surface in the right direction") {
    val a = df(Seq.fill(30)("oldspam oldspam oldspam"))
    val b = df(Seq.fill(30)("newspam newspam newspam"))
    val out = Drift.topMovers(a, b, "text", k = 3)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
    assert(out.contains(("rising", 1, "newspam")), out.mkString(", "))
    assert(out.contains(("falling", 1, "oldspam")), out.mkString(", "))
  }

  test("snapshotDiff labels membership and content changes") {
    val a = Seq((1L, "same text"), (2L, "old  text"), (3L, "gone"))
      .toDF("id", "text")
    val b = Seq((1L, "same text"), (2L, "new text"), (4L, "fresh"))
      .toDF("id", "text")
    val out = Drift.snapshotDiff(a, b, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"), out.toString)
    // whitespace-normalized identity: "old  text" vs "old text" is
    // UNCHANGED (the exact-dedup fingerprint)
    val c = Seq((2L, "old text")).toDF("id", "text")
    val out2 = Drift.snapshotDiff(a, c, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out2(2L) == "unchanged")
  }

  test("report is invariant under partitioning") {
    val a = df(Seq("x y z"))
    val b = df(Seq("p q r"))
    def run(ap: org.apache.spark.sql.DataFrame,
        bp: org.apache.spark.sql.DataFrame) =
      Drift.topMovers(ap, bp, "text", k = 10).collect()
        .map(_.toString).toSeq
    assert(run(a.repartition(7), b.repartition(5)) ==
      run(a.coalesce(1), b.coalesce(1)))
  }
}
