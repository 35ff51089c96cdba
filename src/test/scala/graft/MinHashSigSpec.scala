package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.MinHashSig.minhash_sig

/** The one-pass minhash-signature expression must agree element-for-
  * element with the HOF formulation it replaced
  * (array_min(transform(sh, h => h*a+b)) per permutation), on the
  * codegen and interpreted paths, including wrapping arithmetic. */
class MinHashSigSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Sessions.local()

  private val as = (0 until 16).map(j => 0x9E3779B97F4A7C15L * (2 * j + 1) | 1L)
  private val bs = (0 until 16).map(j => 0xC2B2AE3D27D4EB4FL * (j + 1))

  private val samples: Seq[Array[Long]] = Seq(
    Array(42L),
    Array(Long.MaxValue, Long.MinValue, 0L, -1L),
    Array.tabulate(500)(i => i * 0x9E3779B97F4A7C15L))

  test("native signature equals the per-permutation HOF minima") {
    import spark.implicits._
    val df = samples.toDF("sh")
    val hofCols = as.zip(bs).map { case (a, b) =>
      array_min(transform(col("sh"), h => h * lit(a) + lit(b))) }
    def run() = df.select(
      minhash_sig(col("sh"), as, bs).as("sig"), array(hofCols: _*).as("hof"))
      .collect()
      .map(r => (r.getSeq[Long](0), r.getSeq[Long](1)))
    run().foreach { case (sig, hof) => assert(sig == hof) }
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try run().foreach { case (sig, hof) => assert(sig == hof) }
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("empty shingle set yields the Long.MaxValue identity signature") {
    import spark.implicits._
    val sig = Seq(Array.empty[Long]).toDF("sh")
      .select(minhash_sig(col("sh"), as, bs)).head().getSeq[Long](0)
    assert(sig.forall(_ == Long.MaxValue))
  }
}
