package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.ArgminDist.argmin_dist

/** ArgminDist (KMeansDet's assignment kernel): value parity with the
  * HOF argmin it replaced, codegen/interpreted agreement, null edges. */
class ArgminDistSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Sessions.local()

  private val cents = Array(Array(0.0, 0.0), Array(10.0, 0.0),
    Array(10.0, 0.0), Array(0.0, 5.0))

  private def hofArgmin(vec: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val cl = typedlit(cents.map(_.toSeq).toSeq)
    val dists = transform(cl, c =>
      aggregate(zip_with(vec, c, (a, b) => (a - b) * (a - b)),
        lit(0.0), (s, t) => s + t))
    (array_position(dists, array_min(dists)) - 1).cast("int")
  }

  test("matches the HOF argmin, including duplicate-centroid ties " +
    "(lowest index wins), interpreted and codegen'd") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0 until 200).map(_ =>
      Array(rnd.nextDouble() * 12 - 1, rnd.nextDouble() * 6 - 1)) :+
      Array(10.0, 0.0) // exact tie between centroids 1 and 2 -> index 1
    val df = rows.toDF("v")
    def run() = df.select(argmin_dist(col("v"), cents).as("native"),
      hofArgmin(col("v")).as("hof")).collect()
      .map(r => (r.getInt(0), r.getInt(1)))
    val both = run()
    assert(both.forall { case (n, h) => n == h },
      both.zipWithIndex.filter { case ((n, h), _) => n != h }.take(3)
        .mkString(","))
    assert(both.last == ((1, 1)))
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(run().toSeq == both.toSeq)
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("null array, null element, short array all yield NULL") {
    import spark.implicits._
    val df = Seq(Tuple1(Array(1.0, 2.0))).toDF("v")
    def isNull(c: org.apache.spark.sql.Column) =
      df.select(c).head().isNullAt(0)
    assert(isNull(argmin_dist(lit(null).cast("array<double>"), cents)))
    assert(isNull(argmin_dist(array(lit(1.0), lit(null).cast("double")),
      cents)))
    assert(isNull(argmin_dist(array(lit(1.0)), cents)))
    assert(!isNull(argmin_dist(col("v"), cents)))
  }
}
