package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.ShingleHashes
import graft.functions.ShingleHashes.shingle_hashes

/** The one-pass shingle expression: per-token hashes must equal Spark's
  * xxhash64, window combination must follow the documented polynomial,
  * codegen and interpreted paths must agree, and set semantics (distinct,
  * truncated tail window) must match the HOF formulation's SHAPE —
  * same element count and same equality structure, label-invariant. */
class ShingleHashesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Sessions.local()

  private def reference(tokens: Seq[String], n: Int): Seq[Long] = {
    val th = tokens.map(t => org.apache.spark.sql.catalyst.expressions
      .XXH64.hashUTF8String(
        org.apache.spark.unsafe.types.UTF8String.fromString(t), 42L))
    val cnt = math.max(tokens.length - n, 0) + 1
    (0 until cnt).map { i =>
      th.slice(i, math.min(i + n, tokens.length))
        .foldLeft(0L)((acc, h) => acc * ShingleHashes.P + h)
    }.distinct.sorted
  }

  private val samples = Seq(
    Seq("a"), Seq("a", "b"), Seq("a", "b", "c", "d", "e"),
    Seq("x", "x", "x", "x"), // repeated shingles collapse
    Seq(""), (1 to 300).map(i => s"tok${i % 50}"))

  test("codegen and interpreted paths match the Scala reference") {
    import spark.implicits._
    val df = samples.map(s => Tuple1(s)).toDF("toks")
    def run() = df.select(shingle_hashes(col("toks"), 3))
      .collect().map(_.getSeq[Long](0).sorted)
    assert(run().toSeq == samples.map(reference(_, 3)))
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(run().toSeq == samples.map(reference(_, 3)))
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("identical texts produce identical shingle sets, one-word change " +
    "produces high but sub-1 jaccard") {
    import spark.implicits._
    val a = "the quick brown fox jumps over the lazy dog tonight again"
    val b = a.replace("tonight", "today")
    val df = Seq(a, a, b).toDF("text")
      .select(graft.operators.Dedup.shingles(col("text")).as("g"))
    val rows = df.collect().map(_.getSeq[Long](0).toSet)
    assert(rows(0) == rows(1))
    val j = rows(0).intersect(rows(2)).size.toDouble /
      rows(0).union(rows(2)).size
    assert(j > 0.5 && j < 1.0, s"jaccard $j")
  }
}
