package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Ordinals

/** `operators.Ordinals` must agree exactly with the single-partition
  * window formulation it replaces — including ties that straddle range
  * partition boundaries, null order keys, tiny and empty frames, and
  * k > n NTILE. */
class OrdinalsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Sessions.local()

  private def randomDf(seed: Int, n: Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    // heavy ties: key drawn from a small domain; id unique tie-break
    (0 until n).map(i => (i.toLong,
      if (rnd.nextInt(10) == 0) null
      else rnd.nextInt(7).toString))
      .toDF("id", "key")
  }

  test("global ordinal equals single-partition row_number (random, ties, " +
    "nulls)") {
    for (seed <- 1 to 3) {
      val df = randomDf(seed, 997)
      val ours = Ordinals.withGlobalOrdinal(df, "ord",
        Seq(col("key").asc, col("id").asc), numPartitions = 7)
        .select(col("id"), col("ord"))
      val ref = df.withColumn("ref",
        row_number().over(Window.orderBy(col("key"), col("id")))
          .cast("long"))
        .select(col("id").as("rid"), col("ref"))
      val bad = ours.join(ref, col("id") === col("rid"))
        .filter(col("ord") =!= col("ref")).count()
      assert(bad == 0, s"seed $seed: $bad mismatched ordinals")
    }
  }

  test("global ntile equals single-partition NTILE incl. uneven buckets") {
    for ((n, k) <- Seq((997, 8), (10, 3), (5, 8))) { // 5 rows, 8 buckets
      val df = randomDf(n + k, n)
      val ours = Ordinals.withGlobalNtile(df, "b", k,
        Seq(col("key").asc, col("id").asc), numPartitions = 5)
        .select(col("id"), col("b"))
      val ref = df.withColumn("refb",
        ntile(k).over(Window.orderBy(col("key"), col("id"))))
        .select(col("id").as("rid"), col("refb"))
      val bad = ours.join(ref, col("id") === col("rid"))
        .filter(col("b") =!= col("refb")).count()
      assert(bad == 0, s"(n=$n,k=$k): $bad mismatched buckets")
    }
  }

  test("empty frame yields empty result with the ordinal column") {
    val empty = randomDf(1, 997).filter(col("id") < 0)
    val out = Ordinals.withGlobalOrdinal(empty, "ord", Seq(col("id").asc))
    assert(out.columns.contains("ord"))
    assert(out.count() == 0)
  }
}
