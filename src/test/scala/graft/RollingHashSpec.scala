package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.RollingHash
import graft.functions.RollingHash.rolling_hash

/** The custom Catalyst expression: codegen path vs interpreted path vs a
  * plain-Scala reference implementation must all agree. */
class RollingHashSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Sessions.local()

  private def reference(s: String): Long = {
    var h = RollingHash.Seed
    s.getBytes("UTF-8").foreach(b => h = h * RollingHash.Base + (b & 0xFF))
    h
  }

  private val samples =
    Seq("", "a", "hello world", "Sprint 12", "üñïçødé ☃", "x" * 10000)

  test("codegen result matches the reference implementation") {
    import spark.implicits._
    val got = samples.toDF("s")
      .select(col("s"), rolling_hash(col("s")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    samples.foreach(s => assert(got(s) == reference(s), s"for '$s'"))
  }

  test("interpreted (no-codegen) path agrees") {
    import spark.implicits._
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val got = samples.toDF("s")
        .select(rolling_hash(col("s")).as("h"))
        .collect().map(_.getLong(0))
      assert(got.toSeq == samples.map(reference))
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("registered as a SQL function") {
    RollingHash.register(spark)
    val h = spark.sql("SELECT rolling_hash('hello world') AS h")
      .head().getLong(0)
    assert(h == reference("hello world"))
  }

  test("null-safe") {
    import spark.implicits._
    val r = Seq[Option[String]](None).toDF("s")
      .select(rolling_hash(col("s"))).head()
    assert(r.isNullAt(0))
  }
}
