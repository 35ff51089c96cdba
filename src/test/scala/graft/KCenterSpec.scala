package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.operators.Similarity

/** Farthest-first traversal semantics the oracle can't see: the greedy
  * invariants (seed convention, non-decreasing coverage similarity),
  * partitioning invariance, and the exhausted-corpus edge. */
class KCenterSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Sessions.local()
  import spark.implicits._

  // three well-separated directions plus near-duplicates of each
  private def clustered = Seq(
    (0L, Seq(1f, 0f, 0f)), (1L, Seq(0.99f, 0.02f, 0f)),
    (2L, Seq(0f, 1f, 0f)), (3L, Seq(0.01f, 0.99f, 0f)),
    (4L, Seq(0f, 0f, 1f)), (5L, Seq(0f, 0.02f, 0.99f)))
    .toDF("id", "vec")

  test("seed is the lowest id; picks cover distinct clusters first") {
    val out = Similarity.kCenterSelect(clustered, "id", "vec", k = 3)
      .orderBy("rank").collect()
    assert(out.head.getLong(1) == 0L) // seed convention
    // the first three picks must hit the three clusters, not the
    // near-duplicates of an already-covered one
    val ids = out.map(_.getLong(1)).toSet
    assert(Set(Set(0L, 2L, 4L), Set(0L, 2L, 5L), Set(0L, 3L, 4L),
      Set(0L, 3L, 5L)).contains(ids), s"got $ids")
  }

  test("coverage similarity trace is non-decreasing; invariant under partitioning") {
    val df = Seq.tabulate(40)(i =>
      (i.toLong, Seq(math.cos(i * 0.37).toFloat, math.sin(i * 0.37).toFloat,
        (i % 7).toFloat / 7f))).toDF("id", "vec")
    def run(d: org.apache.spark.sql.DataFrame) =
      Similarity.kCenterSelect(d, "id", "vec", k = 6)
        .orderBy("rank")
        .collect().map(r => (r.getInt(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSeq
    val a = run(df.repartition(13))
    assert(a == run(df.coalesce(1)))
    val trace = a.drop(1).flatMap(_._3)
    assert(trace == trace.sorted, s"maxsim trace must be non-decreasing: $trace")
  }

  test("k=64 crosses the lineage-truncation boundary and matches a " +
      "driver-side greedy reference exactly") {
    // 200 deterministic unit-ish vectors; k=64 crosses the every-32-
    // picks localCheckpoint twice, so the truncated plan must carry
    // the running max and the picked-id filters across the boundary
    val data = Seq.tabulate(200) { i =>
      (i.toLong, Seq(math.cos(i * 0.41).toFloat,
        math.sin(i * 0.29).toFloat, ((i % 11) + 1).toFloat / 11f,
        math.cos(i * 0.13).toFloat))
    }
    val df = data.toDF("id", "vec")
    val out = Similarity.kCenterSelect(df, "id", "vec", k = 64)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSeq
    assert(out.size == 64)
    // driver reference: the same fixed-point greedy, pure Scala
    val q = data.map { case (id, v) =>
      id -> v.map(x => math.floor(x.toDouble * 1e6).toLong)
    }
    def normQ(v: Seq[Long]) = math.sqrt(v.map(x => x.toDouble * x).sum)
    def simFp(a: Seq[Long], b: Seq[Long]): Long =
      math.floor(a.zip(b).map { case (x, y) => x.toDouble * y }.sum /
        (normQ(a) * normQ(b)) * 1e9).toLong
    val usable = q.filter { case (_, v) => v.exists(_ != 0L) }
    var picked = Vector(usable.minBy(_._1))
    var ms = usable.filterNot(_._1 == picked.head._1)
      .map { case (id, v) => (id, v, Long.MinValue) }
    val ref = scala.collection.mutable.Buffer[
      (Int, Long, Option[Long])]((1, picked.head._1, None))
    var rank = 2
    while (rank <= 64 && ms.nonEmpty) {
      ms = ms.map { case (id, v, m) =>
        (id, v, math.max(m, simFp(picked.last._2, v)))
      }
      val nxt = ms.minBy { case (id, _, m) => (m, id) }
      ref += ((rank, nxt._1, Some(nxt._3)))
      picked = picked :+ (nxt._1 -> nxt._2)
      ms = ms.filterNot(_._1 == nxt._1)
      rank += 1
    }
    assert(out == ref.toSeq, "Spark k-center diverged from the greedy reference")
  }

  test("k beyond the usable corpus returns every usable row once") {
    val df = Seq((1L, Seq(1f, 0f)), (2L, Seq(0f, 1f)),
      (3L, Seq(0f, 0f))).toDF("id", "vec") // id 3 is zero-norm → dropped
    val out = Similarity.kCenterSelect(df, "id", "vec", k = 10)
      .collect().map(_.getLong(1)).toSet
    assert(out == Set(1L, 2L))
  }
}
