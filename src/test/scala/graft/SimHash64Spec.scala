package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.SimHash64.simhash64

/** The one-pass SimHash expression must agree with the per-bit HOF vote
  * formulation it replaced, on codegen and interpreted paths. */
class SimHash64Spec extends AnyFunSuite {

  lazy val spark: SparkSession = Sessions.local()

  private def hofSimhash(c: org.apache.spark.sql.Column) =
    (0 until 64).map { i =>
      val vote = aggregate(c, lit(0L), (acc, h) =>
        acc + when(h.bitwiseAND(lit(1L << i)) =!= 0, 1L).otherwise(-1L))
      when(vote > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce((x, y) => x.bitwiseOR(y))

  private val samples: Seq[Array[Long]] = Seq(
    Array(0L),
    Array(-1L),
    Array(42L, 42L, 7L), // duplicates allowed at expression level
    Array(Long.MinValue, Long.MaxValue, 0x5555555555555555L),
    Array.tabulate(300)(i => i * 0x9E3779B97F4A7C15L))

  test("native signature equals the per-bit HOF votes") {
    import spark.implicits._
    val df = samples.toDF("hs")
    def run() = df.select(simhash64(col("hs")).as("a"),
      hofSimhash(col("hs")).as("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    run().foreach { case (a, b) => assert(a == b) }
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try run().foreach { case (a, b) => assert(a == b) }
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("empty set votes all bits negative (zero signature)") {
    import spark.implicits._
    assert(Seq(Array.empty[Long]).toDF("hs")
      .select(simhash64(col("hs"))).head().getLong(0) == 0L)
  }
}
