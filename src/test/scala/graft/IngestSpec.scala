package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import graft.sources.Ingest

/** JSON flattening + type-inference rules (Reader.fs:20-50 semantics,
  * property-pinned per SURVEY §5 plan). */
class IngestSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Sessions.local()

  test("nested records flatten to dotted names, arrays positionally") {
    val df = Ingest.fromJson(spark, Seq(
      """{"WorkItemId": "42", "Iteration": {"StartDate": "2020-01-01",
        |"Number": 3}, "tags": ["a", "b"]}""".stripMargin.replace("\n", ""),
      """{"WorkItemId": "43", "Iteration": {"StartDate": "2020-02-01",
        |"Number": 4}, "tags": ["c"]}""".stripMargin.replace("\n", "")))
    assert(df.columns.toSet == Set("WorkItemId", "Iteration.Number",
      "Iteration.StartDate", "tags.0", "tags.1"))
    val r = df.orderBy("WorkItemId").head()
    assert(r.getAs[Long]("WorkItemId") == 42L)
    assert(r.getAs[String]("tags.0") == "a")
  }

  test("numeric strings become numbers, date strings timestamps") {
    val df = Ingest.fromJson(spark, Seq(
      """{"n": "58.5358796", "i": "442401", "d": "2020-11-19 07:41:51", "s": "Done", "sci": "3.47E-05"}""",
      """{"n": "1.5", "i": "7", "d": "2021-01-01 00:00:00", "s": "Todo", "sci": "1e3"}"""))
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(types("n") == DoubleType)
    assert(types("i") == LongType)
    assert(types("d") == TimestampType)
    assert(types("s") == StringType)
    assert(types("sci") == DoubleType)
  }

  test("mixed / dirty columns stay strings; empty string is missing") {
    val df = Ingest.fromJson(spark, Seq(
      """{"m": "12", "e": ""}""",
      """{"m": "notanumber", "e": "5"}"""))
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(types("m") == StringType)
    // e: "" treated as missing → remaining cells all ints
    assert(types("e") == LongType)
    assert(df.filter(df("e").isNull).count() == 1)
  }
}
