package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Sampling
import graft.sources.Ingest

/** Deterministic hash split/sample properties: partition of the corpus,
  * fraction accuracy, run-to-run stability, monotone sample growth,
  * record-local assignment (independence from the rest of the corpus). */
class SamplingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Sessions.local()

  private def ids(n: Int) = {
    import spark.implicits._
    (0L until n.toLong).toDF("id")
  }

  test("hashSplit partitions the corpus and hits the fractions") {
    val df = Sampling.hashSplit(ids(20000), "id", "salt",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = df.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 20000) // partition: exhaustive + disjoint
    assert(math.abs(counts("train") - 16000) < 400)
    assert(math.abs(counts("val") - 2000) < 200)
    assert(math.abs(counts("test") - 2000) < 200)
  }

  test("assignment is record-local: a subset sees identical splits") {
    val full = Sampling.hashSplit(ids(1000), "id", "s", Seq("a" -> 0.5,
      "b" -> 0.5)).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val sub = Sampling.hashSplit(ids(1000).filter(col("id") % 7 === 0),
      "id", "s", Seq("a" -> 0.5, "b" -> 0.5))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    sub.foreach { case (id, s) => assert(full(id) == s) }
  }

  test("hashSample is monotone in fraction and exact on re-run") {
    val half = Sampling.hashSample(ids(5000), "id", "s", 0.5)
      .collect().map(_.getLong(0)).toSet
    val most = Sampling.hashSample(ids(5000), "id", "s", 0.8)
      .collect().map(_.getLong(0)).toSet
    assert(half.subsetOf(most), "growing a sample must never churn")
    val again = Sampling.hashSample(ids(5000), "id", "s", 0.5)
      .collect().map(_.getLong(0)).toSet
    assert(again == half)
    assert(math.abs(half.size - 2500) < 200)
  }

  test("different salts decorrelate") {
    val a = Sampling.hashSample(ids(5000), "id", "saltA", 0.5)
      .collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(ids(5000), "id", "saltB", 0.5)
      .collect().map(_.getLong(0)).toSet
    val overlap = a.intersect(b).size.toDouble / a.size
    assert(overlap > 0.35 && overlap < 0.65, // ≈ independent halves
      s"salted samples should overlap ~50%, got $overlap")
  }

  test("bad fractions are rejected") {
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(ids(10), "id", "s", Seq("a" -> 0.5, "b" -> 0.4))
    }
    intercept[IllegalArgumentException] {
      Sampling.hashSample(ids(10), "id", "s", 1.5)
    }
  }

  test("a null id raises instead of silently skewing a split") {
    val df = Ingest.localData(spark, Seq("id"),
      Seq(Seq(1L), Seq(null), Seq(3L)))
    val e = intercept[Exception] {
      Sampling.hashSplit(df, "id", "s", Seq("a" -> 0.5, "b" -> 0.5))
        .collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c =>
      String.valueOf(c.getMessage).contains("null id")))
  }

  test("the plan is a shuffle-free narrow map") {
    val df = Sampling.hashSplit(ids(100), "id", "s",
      Seq("a" -> 0.5, "b" -> 0.5))
    assert(PlanChecks.shuffles(df).isEmpty, "hashSplit must not shuffle")
  }

  test("stratifiedSample: per-stratum fractions, equals hashSample per " +
    "stratum, default for unknown strata, still shuffle-free") {
    import spark.implicits._
    val df = (0L until 400L)
      .map(i => (i, Seq("en", "de", "fr", "xx")((i % 4).toInt)))
      .toDF("id", "lang")
    val fr = Map("en" -> 1.0, "de" -> 0.5, "fr" -> 0.25)
    val got = Sampling.stratifiedSample(df, "id", "m", "lang", fr,
      default = 0.1)
    // each stratum's kept set must equal hashSample at that fraction —
    // stratification composes from the same primitive, no new hashing
    (fr + ("xx" -> 0.1)).foreach { case (lang, f) =>
      val expect = Sampling.hashSample(df.filter(col("lang") === lang),
        "id", "m", f).select("id").collect().map(_.getLong(0)).toSet
      val actual = got.filter(col("lang") === lang)
        .select("id").collect().map(_.getLong(0)).toSet
      assert(actual == expect, s"stratum $lang")
    }
    // en at 1.0 keeps everything
    assert(got.filter(col("lang") === "en").count() == 100)
    assert(PlanChecks.shuffles(got).isEmpty,
      "stratifiedSample must not shuffle")
  }

  test("rebalance: binding strata keep everything, rates follow " +
    "C*t/n, absent strata drop") {
    import spark.implicits._
    // sizes 100/200/50/50, equal targets -> C = 200, keep 50 each:
    // rates a=0.5, b=0.25, c=1.0, d=1.0
    val df = (0L until 400L).map { i =>
      val s = if (i < 100) "a" else if (i < 300) "b"
              else if (i < 350) "c" else "d"
      (i, s)
    }.toDF("id", "src") union Seq((400L, "zz")).toDF("id", "src")
    val got = Sampling.rebalance(df, "id", "r1", "src",
      Map("a" -> 0.25, "b" -> 0.25, "c" -> 0.25, "d" -> 0.25))
    val counts = got.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.getOrElse("zz", 0L) == 0L, "untargeted stratum drops")
    assert(counts("c") == 50 && counts("d") == 50,
      s"binding strata keep everything: $counts")
    // a at rate 0.5 of 100, b at 0.25 of 200 — expect ~50 each
    // (salted-hash variance); the achieved mix approximates the target
    assert(math.abs(counts("a") - 50) <= 15, s"a: $counts")
    assert(math.abs(counts("b") - 50) <= 15, s"b: $counts")
    // deterministic: identical on re-run
    val again = Sampling.rebalance(df, "id", "r1", "src",
      Map("a" -> 0.25, "b" -> 0.25, "c" -> 0.25, "d" -> 0.25))
      .groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == counts)
    intercept[IllegalArgumentException] {
      Sampling.rebalance(df, "id", "r1", "src", Map.empty)
    }
    // a target stratum absent from the frame must raise, not silently
    // renormalize the mix over the present strata (ADVICE r8)
    val e = intercept[Exception] {
      Sampling.rebalance(df, "id", "r1", "src",
        Map("a" -> 0.5, "ghost" -> 0.5)).count()
    }
    assert(e.getMessage.contains("target strata"),
      s"wrong error: ${e.getMessage}")
  }

  test("rebalanceByWeight: cuts follow mass, not document count") {
    import spark.implicits._
    // stratum a: 10 heavy docs (100 each = 1000); b: 100 light (10 each
    // = 1000). Equal mass targets → both keep everything (cap binds
    // equally); with COUNT-based rebalance b would be cut to ~10 docs.
    val df = (Seq.tabulate(10)(i => (i.toLong, "a", 100L)) ++
      Seq.tabulate(100)(i => (100L + i, "b", 10L)))
      .toDF("id", "src", "w")
    val got = Sampling.rebalanceByWeight(df, "id", "rw", "src", "w",
      Map("a" -> 0.5, "b" -> 0.5))
    assert(got.count() == 110, "equal mass → nothing cut")
    // null/non-positive weights raise instead of corrupting the budget
    val bad = Seq((1L, "a", 0L), (2L, "b", 5L)).toDF("id", "src", "w")
    val e = intercept[Exception] {
      Sampling.rebalanceByWeight(bad, "id", "rw", "src", "w",
        Map("a" -> 0.5, "b" -> 0.5)).count()
    }
    assert(e.getMessage.contains("non-positive"), e.getMessage)
  }

  test("rebalanceByWeight: fractional weights sum in the native type " +
      "— a sub-1.0-weight stratum is never silently dropped") {
    import spark.implicits._
    // every weight in (0,1): per-row long-casting would truncate each
    // to 0, sum the stratum to 0 mass and silently cut it entirely
    // (ADVICE r9); native-sum-then-cast gives a=50, b=50 — equal mass,
    // nothing cut
    val df = (Seq.tabulate(100)(i => (i.toLong, "a", 0.5)) ++
      Seq.tabulate(100)(i => (100L + i, "b", 0.5)))
      .toDF("id", "src", "w")
    val got = Sampling.rebalanceByWeight(df, "id", "rw", "src", "w",
      Map("a" -> 0.5, "b" -> 0.5))
    assert(got.count() == 200, "equal fractional mass → nothing cut")
    // a stratum whose TOTAL mass still rounds to zero raises in-plan
    // instead of silently renormalizing the mix
    val tiny = (Seq.tabulate(3)(i => (i.toLong, "a", 0.1)) ++
      Seq.tabulate(10)(i => (10L + i, "b", 5.0))).toDF("id", "src", "w")
    val e2 = intercept[Exception] {
      Sampling.rebalanceByWeight(tiny, "id", "rw", "src", "w",
        Map("a" -> 0.5, "b" -> 0.5)).count()
    }
    assert(e2.getMessage.contains("non-positive total mass"),
      e2.getMessage)
  }

  test("shuffleOrder: a deterministic permutation, invariant under " +
      "partitioning, decorrelated across salts") {
    import spark.implicits._
    val df = Seq.tabulate(200)(i => (i.toLong, s"d$i")).toDF("id", "v")
    def run(d: org.apache.spark.sql.DataFrame, salt: String) =
      Sampling.shuffleOrder(d, "id", salt)
        .select("id", "shuffle_pos").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a = run(df.repartition(13), "e0")
    assert(a == run(df.coalesce(1), "e0"), "partitioning must not matter")
    assert(a.values.toSeq.sorted == (1L to 200L), "a 1..n permutation")
    val b = run(df, "e1")
    // different salt → a genuinely different epoch order
    assert(a.count { case (id, p) => b(id) == p } < 20,
      "salts must decorrelate the order")
  }
}
