package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.operators.Surprisal

/** LM-surprisal semantics the oracle can't see: fluent text (pairs the
  * model has seen) must score strictly below gibberish, scores are
  * partitioning-invariant, and the no-evidence / threshold paths. */
class SurprisalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Sessions.local()
  import spark.implicits._

  private val ref = Seq.tabulate(50)(i =>
    (i.toLong, "the cat sat on the mat and the dog ran off"))
    .toDF("doc_id", "text")

  test("seen bigrams score below unseen gibberish") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "zxq wvu tsr qpo nml kji")).toDF("doc_id", "text")
    val m = Surprisal.fit(ref, "text", 1024, "s")
    val out = Surprisal.score(docs, m, "doc_id", "text", 1024, "s")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out(1L) < out(2L),
      s"fluent ${out(1L)} should beat gibberish ${out(2L)}")
  }

  test("scores are invariant under repartitioning") {
    val docs = Seq.tabulate(20)(i =>
      (i.toLong, s"the cat sat on mat $i and dog ran")).toDF("doc_id", "text")
    val m = Surprisal.fit(ref, "text", 512, "s2")
    def run(df: org.apache.spark.sql.DataFrame) =
      Surprisal.score(df, m, "doc_id", "text", 512, "s2")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(run(docs.repartition(17)) == run(docs.coalesce(1)))
  }

  test("documents without a bigram are absent; keep() drops them") {
    val docs = Seq((1L, "single"), (2L, ""), (3L, "the cat sat"))
      .toDF("doc_id", "text")
    val m = Surprisal.fit(ref, "text", 1024, "s")
    val scored = Surprisal.score(docs, m, "doc_id", "text", 1024, "s")
      .select("doc_id").as[Long].collect().toSet
    assert(scored == Set(3L))
    val kept = Surprisal.keep(docs, ref, "doc_id", "text", 1024, "s",
      maxAvg1000 = Long.MaxValue).select("doc_id").as[Long].collect().toSet
    assert(kept == Set(3L))
    // a threshold below any real score keeps nothing
    assert(Surprisal.keep(docs, ref, "doc_id", "text", 1024, "s",
      maxAvg1000 = -1L).count() == 0)
  }

  test("narrow (literal-map) scoring matches the exploded path bit-for-bit") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "zxq wvu tsr qpo nml kji"),
      (3L, "single"), (4L, ""), (5L, "the dog ran off"))
      .toDF("doc_id", "text")
    val m = Surprisal.fit(ref, "text", 1024, "s")
    val exploded = Surprisal.score(docs, m, "doc_id", "text", 1024, "s")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val (mp, mc) = Surprisal.modelMaps(m)
    val narrow = Surprisal
      .withScoresNarrow(docs, mp, mc, "text", 1024, "s")
      .collect().map { r => r.getLong(0) ->
        (if (r.isNullAt(2)) None
         else Some((r.getLong(2), r.getLong(3), r.getLong(4)))) }.toMap
    // every doc flows through narrow; stats agree exactly where the
    // exploded path has evidence, NULL where it has none
    assert(narrow.keySet == Set(1L, 2L, 3L, 4L, 5L))
    exploded.foreach { case (id, st) => assert(narrow(id).contains(st)) }
    assert(narrow(3L).isEmpty && narrow(4L).isEmpty)
  }

  test("beyond the literal-map bound the narrow path refuses and the " +
      "batch path stays a broadcast join") {
    val docs = Seq((1L, "the cat sat")).toDF("doc_id", "text")
    // a model too large to ride the expression tree as a literal map
    val bigB = 1 << 20
    val e = intercept[IllegalArgumentException] {
      Surprisal.withScoresNarrow(docs, Map(1L -> 1L), Map(1L -> 1L),
        "text", bigB, "s")
    }
    assert(e.getMessage.contains("literal map"), e.getMessage)
    // the batch path at the same B: the model side is an explicit
    // broadcast — the plan must keep BroadcastHashJoin, never flip to
    // a shuffled join of corpus pairs against the model
    val m = Surprisal.fit(ref, "text", bigB, "s")
    val plan = Surprisal.score(docs, m, "doc_id", "text", bigB, "s")
      .queryExecution.sparkPlan
    val bhj = plan.collect {
      case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
    }
    assert(bhj.size == 2, s"expected 2 broadcast model joins:\n$plan")
  }
}
