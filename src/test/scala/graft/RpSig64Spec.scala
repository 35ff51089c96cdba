package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.RpSig64.rp_sig64

/** The random-hyperplane signature must agree with a driver-side Scala
  * reference of the same algorithm on both codegen and interpreted
  * paths, and carry the sign-projection symmetry (sig(−v) = ~sig(v)). */
class RpSig64Spec extends AnyFunSuite {

  lazy val spark: SparkSession = Sessions.local()

  private def refSig(v: Array[Double], seed: Long): Long = {
    val votes = new Array[Double](64)
    for (i <- v.indices) {
      var h = seed ^ (i.toLong * 0x9E3779B97F4A7C15L)
      h ^= (h >>> 30); h *= 0xBF58476D1CE4E5B9L
      h ^= (h >>> 27); h *= 0x94D049BB133111EBL
      h ^= (h >>> 31)
      for (j <- 0 until 64)
        if (((h >>> j) & 1L) == 1L) votes(j) += v(i) else votes(j) -= v(i)
    }
    (0 until 64).foldLeft(0L) { (s, j) =>
      if (votes(j) > 0) s | (1L << j) else s
    }
  }

  private val rnd = new scala.util.Random(3)
  private val samples: Seq[Array[Double]] = Seq(
    Array(1.0),
    Array(-1.0, 2.5, 0.0),
    Array.empty[Double],
    Array.fill(64)(rnd.nextGaussian()),
    Array.fill(300)(rnd.nextGaussian()))

  test("native signature equals the Scala reference (codegen + interpreted)") {
    import spark.implicits._
    val df = samples.toDF("v")
    def run() = df.select(col("v"), rp_sig64(col("v"), lit(42L)).as("s"))
      .collect()
      .map(r => (r.getSeq[Double](0).toArray, r.getLong(1)))
    run().foreach { case (v, s) => assert(s == refSig(v, 42L)) }
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try run().foreach { case (v, s) => assert(s == refSig(v, 42L)) }
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("sig(-v) is the bitwise complement of sig(v) (no zero votes)") {
    import spark.implicits._
    // gaussian vector: projection exactly 0 has probability 0, so every
    // plane flips sign with the vector
    val v = Array.fill(64)(rnd.nextGaussian() + 0.1)
    val df = Seq(v, v.map(-_)).toDF("v")
    val sigs = df.select(rp_sig64(col("v"), lit(7L))).collect()
      .map(_.getLong(0))
    assert(sigs(0) == ~sigs(1))
  }

  test("null element yields null; different seeds differ") {
    import spark.implicits._
    val withNull = Seq(Seq[java.lang.Double](1.0, null, 2.0)).toDF("v")
    assert(withNull.select(rp_sig64(col("v"), lit(42L))).head().isNullAt(0))
    val v = Array.fill(64)(rnd.nextGaussian())
    val df = Seq(v).toDF("v")
    val a = df.select(rp_sig64(col("v"), lit(1L))).head().getLong(0)
    val b = df.select(rp_sig64(col("v"), lit(2L))).head().getLong(0)
    assert(a != b)
  }
}
