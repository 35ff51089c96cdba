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
    // the message names the operator AND carries the offending value
    assert(e.getMessage.contains("rebalanceByWeight: bad w 0"),
      e.getMessage)
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

  test("curriculumOrder: bands partition the order (easy first), " +
      "positions are a 1..n permutation, invariant under partitioning") {
    import spark.implicits._
    val df = Seq.tabulate(300)(i =>
      (i.toLong, (i * 37 % 100).toDouble)).toDF("id", "score")
    def run(d: org.apache.spark.sql.DataFrame) =
      Sampling.curriculumOrder(d, "id", "c0", "score", 4)
        .select("id", "band", "shuffle_pos", "score").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
          r.getDouble(3)))
    val a = run(df.repartition(11))
    assert(a.map(_._3).sorted.toSeq == (1L to 300L))
    assert(a.toSet == run(df.coalesce(1)).toSet,
      "partitioning must not matter")
    // every band-b position precedes every band-(b+1) position, and
    // bands are NTILE-balanced
    val byBand = a.groupBy(_._2)
    (1 to 3).foreach { b =>
      assert(byBand(b).map(_._3).max < byBand(b + 1).map(_._3).min) }
    assert(byBand.values.map(_.length).toSet == Set(75))
    // low scores land in early bands: band 1's max score <= band 4's min
    assert(byBand(1).map(_._4).max <= byBand(4).map(_._4).min)
    // hardest-first flips the band contents
    val desc = Sampling.curriculumOrder(df, "id", "c0", "score", 4,
      ascending = false).select("id", "band").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val asc = a.map(t => t._1 -> t._2).toMap
    assert(asc.forall { case (id, b) => desc(id) == 5 - b })
  }

  test("upsampleByFactor: per-row replica count follows the quantized " +
      "factor rule exactly; mass scales by the factor in expectation") {
    import spark.implicits._
    val df = Seq.tabulate(6000)(i =>
      (i.toLong, Seq("en", "de", "fr")(i % 3))).toDF("id", "lang")
    val up = Sampling.upsampleByFactor(df, "id", "up", "lang",
      Map("en" -> 2.5, "de" -> 0.5, "fr" -> 1.0))
    val reps = up.groupBy("id", "lang").agg(
      count(lit(1)).as("n"), max("rep").as("mx"), min("rep").as("mn"))
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3)))
    // replica indices are dense 0..n-1
    reps.foreach { case (_, _, n, mx) => assert(mx == n - 1) }
    // exact per-row rule: base + (hashBucket < cut)
    val buckets = df.select(col("id"),
      Sampling.hashBucket(col("id"), "up").as("b")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byId = reps.map(t => t._1 -> t._3).toMap
    df.collect().foreach { r =>
      val (id, lang) = (r.getLong(0), r.getString(1))
      val (base, cut) = lang match {
        case "en" => (2L, 5000L); case "de" => (0L, 5000L)
        case "fr" => (1L, 0L)
      }
      val want = base + (if (buckets(id) < cut) 1L else 0L)
      assert(byId.getOrElse(id, 0L) == want, s"id=$id lang=$lang")
    }
    // expectation: en ≈ 2000·2.5, de ≈ 2000·0.5, fr = 2000·1.0 exactly
    val counts = up.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(counts("en") - 5000) < 200)
    assert(math.abs(counts("de") - 1000) < 200)
    assert(counts("fr") == 2000)
  }

  test("upsampleByFactor: factor 0 drops the stratum, the default " +
      "passes others through at rep 0, and the plan stays narrow") {
    import spark.implicits._
    val df = Seq.tabulate(100)(i =>
      (i.toLong, if (i % 2 == 0) "junk" else "keep")).toDF("id", "lang")
    val up = Sampling.upsampleByFactor(df, "id", "s", "lang",
      Map("junk" -> 0.0))
    val langs = up.select("lang", "rep").collect()
      .map(r => (r.getString(0), r.getInt(1)))
    assert(langs.forall(_._1 == "keep"))
    assert(langs.forall(_._2 == 0) && langs.length == 50)
    // narrow: no exchange anywhere in the plan
    val plan = up.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("epochPlan: factors hit the budget at the mix; plan→upsample " +
      "round-trips through the fixed point; absent strata raise") {
    import spark.implicits._
    val df = Seq.tabulate(300)(i =>
      (i.toLong, Seq("en", "de")(i % 2), 10L + (i % 7))).toDF(
      "id", "lang", "w")
    val plan = Sampling.epochPlan(df, "lang", "w",
      Map("en" -> 0.75, "de" -> 0.25), budget = 10000L)
    val rows = plan.collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val mass = df.groupBy("lang").agg(sum("w").as("m")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows("en")._1 == mass("en") && rows("de")._1 == mass("de"))
    assert(rows("en")._2 ==
      math.floor(10000L * 0.75 / mass("en") * 10000 + 0.5).toLong)
    assert(rows("de")._2 ==
      math.floor(10000L * 0.25 / mass("de") * 10000 + 0.5).toLong)
    // the factor map reproduces factor1e4 exactly through upsample's
    // round(f·10⁴) quantization
    val fs = Sampling.epochPlanFactors(plan, "lang")
    fs.foreach { case (s, f) =>
      assert(math.round(f * Sampling.Buckets) == rows(s)._2) }
    // upsampled mass lands near the per-stratum budget share
    val up = Sampling.upsampleByFactor(df, "id", "bm", "lang", fs,
      default = 0.0)
    val got = up.groupBy("lang").agg(sum("w").as("m")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(got("en") - 7500) < 500, got.toString)
    assert(math.abs(got("de") - 2500) < 500, got.toString)
    // a target stratum missing from the frame raises in-plan, by name
    val e = intercept[Exception] {
      Sampling.epochPlan(df, "lang", "w",
        Map("en" -> 0.5, "xx" -> 0.5), 1000L).collect()
    }
    assert(e.getMessage.contains("1 of 2"))
    // non-unit target sums are rejected up front
    intercept[IllegalArgumentException] {
      Sampling.epochPlan(df, "lang", "w", Map("en" -> 0.5), 1000L)
    }
    // a null weight would silently vanish from SUM and overstate every
    // factor — raises in-plan instead
    val nulled = df.withColumn("w",
      when(col("id") === 7L, lit(null)).otherwise(col("w")))
    val e2 = intercept[Exception] {
      Sampling.epochPlan(nulled, "lang", "w",
        Map("en" -> 0.75, "de" -> 0.25), 1000L).collect()
    }
    assert(e2.getMessage.contains("null or non-positive"))
  }

  test("epochPlan: fractional weight masses feed the factor arithmetic " +
      "untruncated — B·t_s/m_s exactly, not B·t_s/⌊m_s⌋") {
    import spark.implicits._
    // 100 rows of weight 0.75 per stratum: m_s = 75.0; a per-stratum
    // long cast before the division would use 75 too — so split masses
    // so truncation would visibly shift the factor (m_en = 90.5)
    val df = (Seq.tabulate(100)(i => (i.toLong, "en", 0.905)) ++
      Seq.tabulate(100)(i => (100L + i, "de", 0.515))).toDF(
      "id", "lang", "w")
    val plan = Sampling.epochPlan(df, "lang", "w",
      Map("en" -> 0.5, "de" -> 0.5), budget = 1000L)
    val rows = plan.collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // exact double sums: 100·0.905 = 90.5, 100·0.515 = 51.5 (both exact
    // in binary? 0.905 is not — use the ACTUAL double sum as the spec)
    val mEn = df.filter($"lang" === "en").agg(sum("w")).head.getDouble(0)
    val mDe = df.filter($"lang" === "de").agg(sum("w")).head.getDouble(0)
    assert(rows("en")._2 ==
      math.floor(1000L * 0.5 / mEn * 10000 + 0.5).toLong)
    assert(rows("de")._2 ==
      math.floor(1000L * 0.5 / mDe * 10000 + 0.5).toLong)
    // truncated-mass arithmetic would differ — prove the test has teeth
    assert(rows("en")._2 !=
      math.floor(1000L * 0.5 / mEn.toLong * 10000 + 0.5).toLong)
    // the reported mass column is the display-rounded long
    assert(rows("en")._1 == mEn.toLong && rows("de")._1 == mDe.toLong)
  }

  test("epochPlanFactors: an empty plan names the real cause instead of " +
      "failing later in upsampleByFactor") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String, Long)].toDF("id", "lang", "w")
    val plan = Sampling.epochPlan(empty, "lang", "w",
      Map("en" -> 1.0), budget = 1000L)
    val e = intercept[IllegalStateException] {
      Sampling.epochPlanFactors(plan, "lang")
    }
    assert(e.getMessage.contains("empty plan"), e.getMessage)
  }

  test("temperatureSample: rarest stratum keeps 100%, others keep " +
      "≈√(n_min/n_s) in hash-expectation, and the cut is exact integer " +
      "(partitioning-invariant)") {
    import spark.implicits._
    // 100 rare vs 1600 head docs: head keep rate = √(100/1600) = 25%
    val df = (0 until 100).map(i => (i.toLong, "rare")) ++
      (100 until 1700).map(i => (i.toLong, "head"))
    val d = df.toDF("id", "lang")
    val kept = Sampling.temperatureSample(d.toDF(), "id", "t1", "lang")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val byLang = kept.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byLang("rare") == 100, s"rarest stratum must keep all: $byLang")
    // hash-expectation 400 of 1600; md5 buckets are uniform, allow ±20%
    assert(byLang("head") > 320 && byLang("head") < 480, byLang.toString)
    // exact-integer replay of the cut for one row
    val b = Sampling.hashBucket(org.apache.spark.sql.functions.col("id"),
      "t1")
    val bks = d.select(org.apache.spark.sql.functions.col("id"), b)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    kept.filter(_._2 == "head").foreach { case (id, _) =>
      assert(bks(id) * bks(id) * 1600L < 100000000L * 100L) }
    // partitioning invariance: same survivors at any layout
    val kept11 = Sampling.temperatureSample(
      d.repartition(11), "id", "t1", "lang")
      .collect().map(_.getLong(0)).sorted
    assert(kept11.toSeq == kept.map(_._1).sorted.toSeq)
  }

  test("curriculumOrder: a null score raises in-plan (engines disagree " +
      "on null placement)") {
    import spark.implicits._
    val df = Seq((1L, Some(1.0)), (2L, None), (3L, Some(3.0)))
      .toDF("id", "score")
    val e = intercept[Exception] {
      Sampling.curriculumOrder(df, "id", "s", "score", 2).collect()
    }
    assert(e.getMessage.contains("null score"))
  }
}
