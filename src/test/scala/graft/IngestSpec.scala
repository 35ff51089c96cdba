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

  test("flatten batches all array-size probes into one job per pass") {
    import spark.implicits._
    // AQE turns the single probe aggregate into a fixed number of stage
    // jobs, so the invariant is: job count must NOT grow with the number
    // of sibling array columns (pre-fix: one agg job per array column).
    def countJobs(body: => Unit): Int = JobCounter.count(spark)(body)
    val one = spark.read.json(Seq(
      """{"a": [1, 2], "k": 1}""", """{"a": [3], "k": 2}""").toDS())
    val three = spark.read.json(Seq(
      """{"a": [1, 2], "b": ["x"], "c": [true, false, true], "k": 1}""",
      """{"a": [3], "b": ["y", "z"], "c": [], "k": 2}""").toDS())
    val jobsOne = countJobs(Ingest.flatten(one))
    var flat: org.apache.spark.sql.DataFrame = null
    val jobsThree = countJobs { flat = Ingest.flatten(three) }
    assert(jobsThree == jobsOne,
      s"3-array flatten ran $jobsThree jobs vs $jobsOne for 1 array")
    assert(flat.columns.toSet ==
      Set("a.0", "a.1", "b.0", "b.1", "c.0", "c.1", "c.2", "k"))
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
