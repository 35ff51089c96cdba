package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.hb.Ast.Header
import graft.sources.Providers
import graft.sources.Providers.Fetcher

/** OData/REST provider semantics with an injected fake fetcher:
  * pagination, `$select`/`$filter` assembly, URL-list concatenation,
  * `values` payload extraction, BasicAuth plumbing. */
class ProvidersSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Sessions.local()

  test("odata pages through @odata.nextLink and uniforms the rows") {
    val calls = scala.collection.mutable.ArrayBuffer[String]()
    val fake = new Fetcher {
      def get(url: String, auth: Option[(String, String)]): String = {
        calls += url
        if (!url.contains("skip")) {
          """{"value": [{"WorkItemId": "1", "Iteration": {"Number": 3}}],
            |"@odata.nextLink": "http://x/page?skip=1"}""".stripMargin
        } else
          """{"value": [{"WorkItemId": "2", "Iteration": {"Number": 4}}]}"""
      }
    }
    val df = Providers.odata(spark, "http://x/WorkItemRevisions?",
      select = Some("WorkItemId"), filter = Some("Number gt 1"),
      auth = Some(("u", "p")), fetch = fake)
    assert(calls.size == 2)
    // query values are percent-encoded so the default HttpFetcher's
    // URI.create accepts the URL
    assert(calls.head ==
      "http://x/WorkItemRevisions?$select=WorkItemId&$filter=Number%20gt%201")
    assert(df.count() == 2)
    // flattened + type-inferred
    assert(df.columns.toSet == Set("WorkItemId", "Iteration.Number"))
    assert(df.schema("WorkItemId").dataType ==
      org.apache.spark.sql.types.LongType)
  }

  test("rest concatenates a url list and extracts the values property") {
    val fake = new Fetcher {
      def get(url: String, auth: Option[(String, String)]): String =
        s"""{"count": 1, "value": [{"commitId": "${url.last}", "n": "5"}]}"""
    }
    val df = Providers.rest(spark, Seq("http://a", "http://b", "http://c"),
      valuesProp = Some("value"), fetch = fake)
    assert(df.count() == 3)
    assert(df.columns.toSet == Set("commitId", "n"))
  }

  test("rest without values property reads top-level arrays") {
    val fake = new Fetcher {
      def get(url: String, auth: Option[(String, String)]): String =
        """[{"a": 1}, {"a": 2}]"""
    }
    assert(Providers.rest(spark, Seq("http://x"), fetch = fake).count() == 2)
  }

  test("fromHeader dispatches providers and resolves auth env refs") {
    var seenAuth: Option[(String, String)] = None
    val fake = new Fetcher {
      def get(url: String, auth: Option[(String, String)]): String = {
        seenAuth = auth
        """{"value": [{"x": 1}]}"""
      }
    }
    val h = Header(
      props = Map("provider" -> "odata", "url" -> "http://x?",
        "user" -> "$NOT_AN_ENV_VAR_12345", "pwd" -> "literalpwd"),
      lists = Map(), meta = Map())
    Providers.fromHeader(spark, h, fetch = fake)
    // unset env refs fall back to the literal; plain values pass through
    assert(seenAuth.contains(("$NOT_AN_ENV_VAR_12345", "literalpwd")))

    val hp = Header(Map("provider" -> "parquet", "table" -> "region"),
      Map(), Map())
    assert(Providers.fromHeader(spark, hp,
      dataDir = "/root/testdata/sf0.001").count() == 5)

    intercept[IllegalArgumentException] {
      Providers.fromHeader(spark,
        Header(Map("provider" -> "jira"), Map(), Map()))
    }
  }

  test("git provider ingests git-log JSON lines (collector recipe)") {
    // the exact line shape the documented `git log --pretty=format:`
    // recipe emits
    val dir = java.nio.file.Files.createTempDirectory("graftgit")
    val f = dir.resolve("commits.jsonl")
    java.nio.file.Files.writeString(f,
      """{"commit":"a1b2","author":"Ada","email":"ada@x","date":"2024-01-02T03:04:05+00:00","subject":"Fix-the-thing","parents":"9f8e"}
        |{"commit":"9f8e","author":"Lin","email":"lin@x","date":"2024-01-01T00:00:00+00:00","subject":"Initial","parents":""}
        |""".stripMargin)
    val df = Providers.gitLog(spark, f.toString)
    assert(df.count() == 2)
    assert(df.columns.toSet ==
      Set("commit", "author", "email", "date", "subject", "parents"))
    // dispatches from a .hb header too
    val h = Header(Map("provider" -> "git", "path" -> f.toString),
      Map(), Map())
    assert(Providers.fromHeader(spark, h).count() == 2)
  }

  test("nextLink extraction handles escapes") {
    assert(Providers.nextLink(
      """{"@odata.nextLink": "http:\/\/x\/p?a=1"}""")
      .contains("http://x/p?a=1"))
    assert(Providers.nextLink("""{"value": []}""").isEmpty)
  }
}
