package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.cache.LineageCache
import graft.hb.Configurations._
import graft.sources.Ingest

/** Configuration graph resolution: provider / merge / join sources,
  * recursive chains, cycle detection, lineage-cache reuse — the
  * MergeJoinTest.fs shape of the reference workbench. */
class ConfigurationsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Sessions.local()

  private def tables: String => org.apache.spark.sql.DataFrame = {
    case "sprints_a" => Ingest.localData(spark, Seq("Sprint", "Done"),
      Seq(Seq[Any]("S1", 3L), Seq[Any]("S2", 5L)))
    case "sprints_b" => Ingest.localData(spark, Seq("Sprint", "Done"),
      Seq(Seq[Any]("S3", 2L)))
    case "meta" => Ingest.localData(spark, Seq("Sprint", "Team"),
      Seq(Seq[Any]("S1", "red"), Seq[Any]("S2", "blue"),
        Seq[Any]("S3", "red")))
    case other => fail(s"unexpected table $other")
  }

  private val configs = Map(
    "a" -> conf(TableSource("sprints_a"), "only (Done > 0)"),
    "b" -> conf(TableSource("sprints_b"), "only true"),
    "all" -> conf(MergeOf(Seq("a", "b")), "sort by column Sprint"),
    "joined" -> conf(JoinOf("all", "meta_cfg", "Sprint"),
      "create column Big (if [Done > 2] {'yes'} else {'no'})"),
    "meta_cfg" -> Conf(TableSource("meta"), Nil))

  test("merge + join of configuration outputs") {
    val r = new Runner(spark, tables)
    val all = r.run(configs, "all")
    assert(all.count() == 3)
    val joined = r.run(configs, "joined").orderBy("Sprint")
    assert(joined.columns.toSet == Set("Sprint", "Done", "Team", "Big"))
    val rows = joined.collect()
    assert(rows.map(_.getAs[String]("Team")).toSeq ==
      Seq("red", "blue", "red"))
    assert(rows.map(_.getAs[String]("Big")).toSeq == Seq("yes", "yes", "no"))
  }

  test("cycles are rejected") {
    val cyclic = Map(
      "x" -> Conf(MergeOf(Seq("y")), Nil),
      "y" -> Conf(MergeOf(Seq("x")), Nil))
    intercept[IllegalArgumentException] {
      new Runner(spark, tables).run(cyclic, "x")
    }
  }

  test("lineage cache computes shared prefixes once across runners") {
    val dir = java.nio.file.Files.createTempDirectory("graftconf").toString
    var resolves = 0
    val counting: String => org.apache.spark.sql.DataFrame = { t =>
      resolves += 1; tables(t)
    }
    val cache = new LineageCache(spark, dir)
    val r1 = new Runner(spark, counting, Some(cache))
    r1.run(configs, "all").count()
    val afterFirst = resolves
    assert(afterFirst > 0)
    // a fresh runner (new session of work) hits the parquet checkpoints
    val r2 = new Runner(spark, counting, Some(cache))
    r2.run(configs, "all").count()
    assert(resolves == afterFirst) // no table re-resolution: cache hit
  }
}
