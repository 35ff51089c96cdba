package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** MaxCosQ (the codegen'd semantic-decon inner loop) must be
  * value-identical to the HOF formulation it replaced:
  * max over evals of floor(dotQ/(‖v‖·‖e‖)·1e9), -1e9 sentinel. */
class MaxCosQSpec extends AnyFunSuite {

  lazy val spark = Sessions.local()
  import spark.implicits._

  private def hofReference(vecs: Seq[Array[Float]],
      evals: Seq[Array[Float]]): Seq[Long] = {
    def q(v: Array[Float]): Array[Long] =
      v.map(x => math.floor(x.toDouble * 1e6).toLong)
    def nrm(v: Array[Long]): Double =
      math.sqrt(v.map(x => x * x).sum.toDouble)
    vecs.map { v =>
      val qv = q(v); val vn = nrm(qv)
      val sims = evals.map { e =>
        val qe = q(e); val en = nrm(qe)
        if (vn > 0 && en > 0)
          math.floor(qv.zip(qe).map { case (a, b) => a * b }.sum.toDouble /
            (vn * en) * 1e9).toLong
        else -1000000000L
      }
      if (sims.isEmpty) -1000000000L else sims.max
    }
  }

  test("parity with the scalar reference on random vectors") {
    val rnd = new scala.util.Random(7)
    val vecs = (0 until 40).map(_ => Array.fill(16)(rnd.nextFloat() - 0.5f))
    val evals = (0 until 9).map(_ => Array.fill(16)(rnd.nextFloat() - 0.5f))
    val corpus = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")
    val evalDf = evals.zipWithIndex.map { case (v, i) => (100L + i, v) }
      .toDF("vec_id", "embedding")
    val got = graft.operators.Decontaminate
      .semanticFlag(corpus, evalDf, "vec_id", "embedding", 0L)
      .orderBy("vec_id").collect().map(_.getAs[Long]("max_cos_fp")).toSeq
    assert(got === hofReference(vecs, evals))
  }

  test("sentinels: zero-norm vector, empty eval set") {
    val corpus = Seq((0L, Array.fill(8)(0f)), (1L, Array.fill(8)(0.5f)))
      .toDF("vec_id", "embedding")
    val evalDf = Seq((9L, Array.fill(8)(0.5f))).toDF("vec_id", "embedding")
    val out = graft.operators.Decontaminate
      .semanticFlag(corpus, evalDf, "vec_id", "embedding", 999999999L)
      .orderBy("vec_id").collect()
    assert(out(0).getAs[Long]("max_cos_fp") == -1000000000L)
    assert(out(1).getAs[Long]("max_cos_fp") >= 999999999L) // identical vec
    val empty = graft.operators.Decontaminate
      .semanticFlag(corpus, evalDf.limit(0), "vec_id", "embedding", 0L)
      .collect()
    assert(empty.forall(_.getAs[Long]("max_cos_fp") == -1000000000L))
  }

  test("interpreted path agrees with codegen (NO_CODEGEN factory)") {
    val rnd = new scala.util.Random(11)
    val vecs = (0 until 10).map(_ => Array.fill(8)(rnd.nextFloat() - 0.5f))
    val evals = (0 until 4).map(_ => Array.fill(8)(rnd.nextFloat() - 0.5f))
    val corpus = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")
    val evalDf = evals.zipWithIndex.map { case (v, i) => (100L + i, v) }
      .toDF("vec_id", "embedding")
    def run(): Seq[Long] = graft.operators.Decontaminate
      .semanticFlag(corpus, evalDf, "vec_id", "embedding", 0L)
      .orderBy("vec_id").collect().map(_.getAs[Long]("max_cos_fp")).toSeq
    val expected = hofReference(vecs, evals)
    assert(run() === expected)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(run() === expected)
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }
}
