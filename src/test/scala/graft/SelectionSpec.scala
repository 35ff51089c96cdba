package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Selection

/** Stratified selection semantics the oracle can't see: partitioning
  * invariance of the two-phase top-k (including score ties straddling
  * partitions), the ceil boundary of the fractional cut, and the
  * null-score rejection path.
  */
class SelectionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Sessions.local()
  import spark.implicits._

  private def scored(rows: (Long, String, Long)*) =
    rows.toDF("id", "dom", "score")

  test("topK keeps the best k per stratum by (score desc, id asc)") {
    val df = scored(
      (1L, "a", 10L), (2L, "a", 30L), (3L, "a", 20L),
      (4L, "b", 5L), (5L, "b", 5L), (6L, "b", 7L))
    val out = Selection.topKPerStratum(df, "dom", "score", "id", 2)
      .select("dom", "rank", "id")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    // b: 7 wins, then the 5-5 tie resolves to the lower id (4).
    assert(out == Set(("a", 1, 2L), ("a", 2, 3L), ("b", 1, 6L), ("b", 2, 4L)))
  }

  test("topK is invariant under repartitioning, ties straddling partitions") {
    // 40 rows, ALL the same score: winners are ids 0..4 per stratum by
    // the id tie-break, no matter which partition pruned them first.
    val df = (0L until 40L).map(i => (i, if (i % 2 == 0) "x" else "y", 1L))
      .toDF("id", "dom", "score")
    val expected = Selection
      .topKPerStratum(df.coalesce(1), "dom", "score", "id", 5)
      .select("dom", "rank", "id")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    val shuffled = Selection
      .topKPerStratum(df.repartition(13, col("id")), "dom", "score", "id", 5)
      .select("dom", "rank", "id")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(shuffled == expected)
    assert(expected.map(_._3) == Set(0L, 2L, 4L, 6L, 8L, 1L, 3L, 5L, 7L, 9L))
  }

  test("topFrac keeps ceil(n*num/den) — every non-empty stratum keeps >= 1") {
    // strata of size 1, 3, 4 at 1/4: keep ceil(.25)=1, ceil(.75)=1, 1.
    val df = scored(
      (1L, "s1", 9L),
      (2L, "s3", 1L), (3L, "s3", 2L), (4L, "s3", 3L),
      (5L, "s4", 1L), (6L, "s4", 2L), (7L, "s4", 3L), (8L, "s4", 4L))
    val out = Selection.topFracPerStratum(df, "dom", "score", "id", 1, 4)
      .select("dom", "id")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSet
    assert(out == Set("s1" -> 1L, "s3" -> 4L, "s4" -> 8L))
  }

  test("topFrac num=den keeps everything, num=0 keeps nothing") {
    val df = scored((1L, "a", 1L), (2L, "a", 2L), (3L, "b", 3L))
    assert(Selection.topFracPerStratum(df, "dom", "score", "id", 1, 1).count() == 3)
    assert(Selection.topFracPerStratum(df, "dom", "score", "id", 0, 1).count() == 0)
  }

  test("null score raises in-plan") {
    val df = Seq((1L, "a", Some(1L)), (2L, "a", None))
      .toDF("id", "dom", "score")
    val e = intercept[Exception] {
      Selection.topKPerStratum(df, "dom", "score", "id", 1).collect()
    }
    assert(e.getMessage.contains("null score"))
  }
}
