package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.DotQ
import graft.functions.DotQ.dot_q

/** The quantized-dot Catalyst expression: codegen path, interpreted path,
  * the HOF zip_with+aggregate formulation it replaced, and plain Scala
  * must all agree (incl. wrapping overflow). */
class DotQSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Sessions.local()

  private val samples: Seq[(Array[Long], Array[Long])] = Seq(
    (Array(1L, 2L, 3L), Array(4L, 5L, 6L)),
    (Array.empty[Long], Array.empty[Long]),
    (Array(Long.MaxValue, 7L), Array(3L, -2L)), // wraps
    (Array.tabulate(64)(i => i * 1000003L),
      Array.tabulate(64)(i => -i * 31L)))

  private def reference(a: Array[Long], b: Array[Long]): Long = {
    var s = 0L
    for (i <- 0 until math.min(a.length, b.length)) s += a(i) * b(i)
    s
  }

  test("codegen, interpreted, and HOF formulations agree") {
    import spark.implicits._
    val df = samples.toDF("a", "b")
    def run(): Seq[(Long, Long)] = df.select(
      dot_q(col("a"), col("b")).as("native"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0L),
        (acc, x) => acc + x).as("hof"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val expected = samples.map { case (a, b) => reference(a, b) }
    assert(run().map(_._1) == expected)
    assert(run().map(_._2) == expected)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(run().map(_._1) == expected)
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("null-safe and SQL-registered") {
    import spark.implicits._
    val r = Seq((Option.empty[Array[Long]], Array(1L)))
      .toDF("a", "b").select(dot_q(col("a"), col("b"))).head()
    assert(r.isNullAt(0))
    DotQ.register(spark)
    assert(spark.sql("SELECT dot_q(array(2L, 3L), array(10L, 100L)) AS d")
      .head().getLong(0) == 320L)
  }

  test("null element or unequal lengths yield NULL, like the HOF form") {
    DotQ.register(spark)
    // zip_with pads the shorter array with null, aggregate's acc+null is
    // null — dot_q mirrors that instead of silently truncating
    val q = """SELECT dot_q(array(1L, 2L), array(1L)) AS short,
              |  dot_q(array(1L, CAST(NULL AS BIGINT)), array(1L, 1L)) AS nul
              |""".stripMargin
    def run() = { val r = spark.sql(q).head(); (r.isNullAt(0), r.isNullAt(1)) }
    assert(run() == ((true, true)))
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(run() == ((true, true)))
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }
}
