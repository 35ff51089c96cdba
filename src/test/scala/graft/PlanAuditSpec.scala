package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The ingest-layout rule, self-policing (round-14 finding): parquet
  * splits at row-group granularity, so a big single-row-group file caps
  * every scan of it at 1-way parallelism no matter what the plan says.
  * PlanAudit reads the footers — the only place the truth lives. */
class PlanAuditSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Sessions.local()

  /** ~4 MB raw of hex noise (md5 ≈ incompressible enough that the
    * snappy file stays > 1 MB), written with the given writer opts. */
  private def writeFixture(dir: String, oneGroup: Boolean): Unit = {
    import spark.implicits._
    val df = (0 until 30000).map { i =>
      (i.toLong, Seq.tabulate(4)(j => s"$i/$j").mkString("|"))
    }.toDF("id", "seed")
      .withColumn("noise", concat(md5(col("seed")), md5(concat(col("seed"),
        lit("a"))), md5(concat(col("seed"), lit("b"))),
        md5(concat(col("seed"), lit("c")))))
    val w = df.coalesce(1).write.mode("overwrite")
    // one row group = default 128 MB block; many = 1 MB blocks
    (if (oneGroup) w else w.option("parquet.block.size", 1L << 20))
      .parquet(dir)
  }

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val olds = pairs.map { case (k, _) =>
      k -> scala.util.Try(spark.conf.get(k)).toOption
    }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("fires on a big single-row-group file, silent on the 1 MB-block " +
    "layout of the same rows") {
    val base = java.nio.file.Files.createTempDirectory("pa").toString
    writeFixture(s"$base/one", oneGroup = true)
    writeFixture(s"$base/many", oneGroup = false)
    val (g1, b1, _) = PlanAudit.parquetLayout(spark, s"$base/one")
    val (gm, bm, _) = PlanAudit.parquetLayout(spark, s"$base/many")
    assert(g1 === 1L)
    assert(gm >= 2L, s"expected >=2 row groups, got $gm ($bm bytes)")
    assert(b1 > (1L << 20), s"fixture too small to exercise the rule: $b1")
    // table > warnBytes and size calls for >= 2 splits at 1 MB/split
    withConf("graft.scan.warnBytes" -> (1L << 20).toString,
      "spark.sql.files.maxPartitionBytes" -> (1L << 20).toString) {
      assert(PlanAudit.narrowLayoutWarning(spark, s"$base/one").isDefined)
      assert(PlanAudit.narrowLayoutWarning(spark, s"$base/many").isEmpty)
    }
  }

  test("small tables are never flagged (default 64 MB floor)") {
    val base = java.nio.file.Files.createTempDirectory("pa2").toString
    writeFixture(s"$base/one", oneGroup = true)
    assert(PlanAudit.narrowLayoutWarning(spark, s"$base/one").isEmpty)
  }

  test("strict mode raises through the ingest hook; non-strict warns " +
    "and memoizes") {
    val base = java.nio.file.Files.createTempDirectory("pa3").toString
    writeFixture(s"$base/one", oneGroup = true)
    withConf("graft.scan.warnBytes" -> (1L << 20).toString,
      "spark.sql.files.maxPartitionBytes" -> (1L << 20).toString,
      "graft.scan.strict" -> "true") {
      val e = intercept[IllegalArgumentException] {
        PlanAudit.warnIfNarrowLayout(spark, s"$base/one")
      }
      assert(e.getMessage.contains("narrow-scan-layout"))
      // memoized: the second call must not raise again (once per path)
      PlanAudit.warnIfNarrowLayout(spark, s"$base/one")
    }
  }

  test("repartitionIfLayoutBound lifts a layout-bound frame to cluster " +
    "parallelism and leaves a wide frame alone") {
    val base = java.nio.file.Files.createTempDirectory("pa4").toString
    writeFixture(s"$base/one", oneGroup = true)
    val par = spark.sparkContext.defaultParallelism
    val narrow = spark.read.parquet(s"$base/one")
    val lifted = PlanAudit.repartitionIfLayoutBound(narrow)
    assert(lifted.rdd.getNumPartitions === par)
    // same rows either way — the exchange is correctness-neutral
    assert(lifted.count() === narrow.count())
    val wide = narrow.repartition(par * 2)
    assert(PlanAudit.repartitionIfLayoutBound(wide) eq wide)
  }
}
