package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.operators.Classifier

/** Hashed-NB classifier semantics the oracle can't see: a document made
  * of positive-seed vocabulary must out-margin one made of
  * negative-seed vocabulary, margins are partitioning-invariant, and
  * the no-evidence / threshold paths mirror Surprisal's policy. */
class ClassifierSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Sessions.local()
  import spark.implicits._

  private val pos = Seq.tabulate(40)(i =>
    (i.toLong, "clear prose explains the careful experiment and result"))
    .toDF("doc_id", "text")
  private val neg = Seq.tabulate(40)(i =>
    (i.toLong, "click buy cheap deal now win free spam offer"))
    .toDF("doc_id", "text")

  test("positive-seed vocabulary out-margins negative-seed vocabulary") {
    val docs = Seq(
      (1L, "the careful experiment explains the result"),
      (2L, "buy cheap spam deal win free now")).toDF("doc_id", "text")
    val m = Classifier.fit(pos, neg, "text", 1024, "c")
    val out = Classifier.score(docs, m, "doc_id", "text", 1024, "c")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out(1L) > 0L, s"positive-like doc margin ${out(1L)} should be > 0")
    assert(out(2L) < 0L, s"negative-like doc margin ${out(2L)} should be < 0")
  }

  test("margins are invariant under repartitioning") {
    val docs = Seq.tabulate(20)(i =>
      (i.toLong, s"careful experiment $i cheap deal result")).toDF("doc_id", "text")
    val m = Classifier.fit(pos, neg, "text", 512, "c2")
    def run(df: org.apache.spark.sql.DataFrame) =
      Classifier.score(df, m, "doc_id", "text", 512, "c2")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(run(docs.repartition(17)) == run(docs.coalesce(1)))
  }

  test("documents without a token are absent; keep() thresholds") {
    val docs = Seq((1L, ""), (2L, "   "), (3L, "careful experiment result"))
      .toDF("doc_id", "text")
    val m = Classifier.fit(pos, neg, "text", 1024, "c")
    val scored = Classifier.score(docs, m, "doc_id", "text", 1024, "c")
      .select("doc_id").as[Long].collect().toSet
    assert(scored == Set(3L))
    val kept = Classifier.keep(docs, pos, neg, "doc_id", "text", 1024, "c",
      minMargin1000 = Long.MinValue).select("doc_id").as[Long].collect().toSet
    assert(kept == Set(3L))
    // a threshold above any real score keeps nothing
    assert(Classifier.keep(docs, pos, neg, "doc_id", "text", 1024, "c",
      minMargin1000 = Long.MaxValue).count() == 0)
  }

  test("narrow (literal-map) scoring matches the exploded path bit-for-bit") {
    val docs = Seq(
      (1L, "the careful experiment explains the result"),
      (2L, "buy cheap spam deal win free now"),
      (3L, ""), (4L, "mixed careful cheap words here"))
      .toDF("doc_id", "text")
    val m = Classifier.fit(pos, neg, "text", 1024, "c")
    val exploded = Classifier.score(docs, m, "doc_id", "text", 1024, "c")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val (mp, mn, np, nn) = Classifier.modelMaps(m)
    val narrow = Classifier
      .withMarginsNarrow(docs, mp, mn, np, nn, "text", 1024, "c")
      .collect().map { r => r.getLong(0) ->
        (if (r.isNullAt(2)) None
         else Some((r.getLong(2), r.getLong(3), r.getLong(4)))) }.toMap
    assert(narrow.keySet == Set(1L, 2L, 3L, 4L))
    exploded.foreach { case (id, st) => assert(narrow(id).contains(st)) }
    assert(narrow(3L).isEmpty)
  }

  test("beyond the literal-map bound the narrow path refuses and the " +
      "batch path stays a broadcast join") {
    val docs = Seq((1L, "the careful experiment")).toDF("doc_id", "text")
    val bigB = 1 << 20
    val e = intercept[IllegalArgumentException] {
      Classifier.withMarginsNarrow(docs, Map(1L -> 1L), Map(1L -> 1L),
        1L, 1L, "text", bigB, "c")
    }
    assert(e.getMessage.contains("literal map"), e.getMessage)
    val m = Classifier.fit(pos, neg, "text", bigB, "c")
    val plan = Classifier.score(docs, m, "doc_id", "text", bigB, "c")
      .queryExecution.sparkPlan
    val bhj = plan.collect {
      case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
    }
    assert(bhj.nonEmpty, s"expected a broadcast model join:\n$plan")
  }
}
