package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.{ODataSource, Providers}

/** A 3-page item feed keyed by `$skip`, shaped like the reference's
  * WorkItemRevisions payloads. DSv2 builds fetchers reflectively by
  * class name, so this lives top-level with a no-arg constructor; the
  * companion records every requested URL (executor == driver JVM in
  * local mode) so specs can assert what was pushed into the wire
  * request. When a `$filter` mentioning `size` is present, the fake
  * server actually applies it (rows with size ≤ 20 withheld) — proving
  * Spark's residual re-evaluation doesn't depend on server behavior
  * either way. */
class FakeODataFetcher extends Providers.Fetcher {
  import FakeODataFetcher._
  def get(url0: String, auth: Option[(String, String)]): String = {
    // record/match on the DECODED url — the wire form percent-encodes
    // query values (space → %20)
    val url = java.net.URLDecoder.decode(url0, "UTF-8")
    calls.add(url)
    val filtered = url.contains("$filter=") && url.contains("size gt 20")
    // honor $select like a real service: omit unselected fields — this is
    // what makes the select-widening specs meaningful (a residual filter
    // on a server-omitted field would see NULLs)
    val selected: Option[Set[String]] =
      "\\$select=([^&]*)".r.findFirstMatchIn(url)
        .map(_.group(1).split(",").map(_.trim).toSet)
    def field(n: String, v: String): Option[String] =
      if (selected.forall(_.contains(n))) Some(s""""$n": $v""") else None
    def page(rows: Seq[(Long, String, Long)], next: Option[Int]): String = {
      val kept = if (filtered) rows.filter(_._3 > 20) else rows
      val vals = kept.map { case (id, nm, sz) =>
        Seq(field("id", id.toString), field("name", s""""$nm""""),
          field("size", sz.toString)).flatten.mkString("{", ", ", "}")
      }.mkString("[", ",", "]")
      val nl = next.map(n =>
        s""","@odata.nextLink": "http://fake/items?$$skip=$n"""")
        .getOrElse("")
      s"""{"value": $vals$nl}"""
    }
    val skip = "\\$skip=(\\d+)".r.findFirstMatchIn(url)
      .map(_.group(1).toInt).getOrElse(0)
    skip match {
      case 0 => page(Seq((1L, "a", 10L), (2L, "b", 30L)), Some(2))
      case 2 => page(Seq((3L, "c", 25L), (4L, "d", 5L)), Some(4))
      case _ => page(Seq((5L, "e", 40L)), None)
    }
  }
}

object FakeODataFetcher {
  val calls = new java.util.concurrent.ConcurrentLinkedQueue[String]()
}

/** A server that HONORS $skip but CAPS $top at 2 rows per response,
  * answering short windows with a continuation nextLink — the Azure-style
  * behavior that silently starved a naive $skip/$top reader. Serves ids
  * 0..9 (id = skip index). */
class CappedTopFetcher extends Providers.Fetcher {
  def get(url0: String, auth: Option[(String, String)]): String = {
    val url = java.net.URLDecoder.decode(url0, "UTF-8")
    CappedTopFetcher.calls.add(url)
    def param(p: String) = ("\\$" + p + "=(\\d+)").r
      .findFirstMatchIn(url).map(_.group(1).toInt)
    val skip = param("skip").getOrElse(0)
    val top = param("top").getOrElse(10)
    val served = math.min(top, 2) // the cap
    val ids = (skip until math.min(skip + served, 10)).toList
    val vals = ids.map(i => s"""{"id": $i}""").mkString("[", ",", "]")
    val remaining = top - served
    val nextStart = skip + served
    val nl =
      if (remaining > 0 && nextStart < 10)
        s""","@odata.nextLink": "http://capped/items?$$skip=$nextStart&$$top=$remaining""""
      else ""
    s"""{"value": $vals$nl}"""
  }
}

object CappedTopFetcher {
  val calls = new java.util.concurrent.ConcurrentLinkedQueue[String]()
}

/** A feed with an Edm.Date column (`day`), ids 1..6 on days
  * 2019-01-01..06. Honors a `day gt yyyy-mm-dd` filter when present —
  * so the date-pushdown spec proves both the wire form AND that fewer
  * rows cross the wire when the server cooperates. */
class DateFeedFetcher extends Providers.Fetcher {
  def get(url0: String, auth: Option[(String, String)]): String = {
    val url = java.net.URLDecoder.decode(url0, "UTF-8")
    DateFeedFetcher.calls.add(url)
    val cut = "day gt (\\d{4}-\\d{2}-\\d{2})".r.findFirstMatchIn(url)
      .map(_.group(1))
    val rows = (1 to 6).map(i => (i.toLong, f"2019-01-$i%02d"))
      .filter { case (_, d) => cut.forall(d > _) }
    val vals = rows.map { case (i, d) =>
      s"""{"id": $i, "day": "$d"}""" }.mkString("[", ",", "]")
    s"""{"value": $vals}"""
  }
}

object DateFeedFetcher {
  val calls = new java.util.concurrent.ConcurrentLinkedQueue[String]()
}

/** A feed with a navigation property (`iteration`, a struct like the
  * reference's WorkItem `Iteration`): the nav property is OMITTED
  * unless the request carries `$expand=iteration` — standard OData
  * service behavior, which is what makes the derived-$expand test
  * meaningful. Records every URL. */
class NavPropFetcher extends Providers.Fetcher {
  import NavPropFetcher._
  def get(url0: String, auth: Option[(String, String)]): String = {
    val url = java.net.URLDecoder.decode(url0, "UTF-8")
    calls.add(url)
    val expanded = "\\$expand=([^&]*)".r.findFirstMatchIn(url)
      .exists(_.group(1).split(",").map(_.trim).contains("iteration"))
    val vals = (1 to 3).map { i =>
      val it = if (expanded)
        s""", "iteration": {"path": "sprint-$i", "start": "2020-0$i-01"}"""
      else ""
      s"""{"id": $i$it}"""
    }.mkString("[", ",", "]")
    s"""{"value": $vals}"""
  }
}

object NavPropFetcher {
  val calls = new java.util.concurrent.ConcurrentLinkedQueue[String]()
}

/** Serves a valid schema-probe page but an error payload (no `value`
  * array) for every paged scan request. */
class ErrorPayloadFetcher extends Providers.Fetcher {
  def get(url: String, auth: Option[(String, String)]): String =
    if (url.contains("skip"))
      """{"error": {"code": "429", "message": "throttled"}}"""
    else """{"value": [{"id": 1}]}"""
}

class ODataSourceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Sessions.local()

  private def read() = spark.read
    .format(classOf[ODataSource].getName)
    .option("url", "http://fake/items")
    .option("fetcher", classOf[FakeODataFetcher].getName)
    .load()

  test("scans all pages via nextLink; schema inferred from first page") {
    FakeODataFetcher.calls.clear()
    val df = read()
    assert(df.columns.sorted.toSeq == Seq("id", "name", "size"))
    assert(df.count() == 5)
    assert(df.select(sum(col("id"))).head().getLong(0) == 15L)
  }

  test("predicates push down into \\$filter on the request URL " +
    "and results stay exact") {
    FakeODataFetcher.calls.clear()
    val df = read().filter(col("size") > 20)
    val rows = df.select("id").orderBy("id").collect().map(_.getLong(0))
    assert(rows.toSeq == Seq(2L, 3L, 5L))
    val scanCalls = FakeODataFetcher.calls.toArray(Array.empty[String])
      .filter(_.contains("$filter="))
    assert(scanCalls.nonEmpty, "no request carried the pushed $filter")
    // Catalyst pushes IsNotNull(size) alongside the comparison, so the
    // combined $filter is e.g. "(size ne null) and (size gt 20)"
    assert(scanCalls.forall(_.contains("size gt 20")))
  }

  test("pushdown survives a server that IGNORES \\$filter (residual " +
    "re-evaluation)") {
    // name-based predicate: the fake only honors `size` filters, so the
    // server returns everything and Spark's residual filter must prune
    FakeODataFetcher.calls.clear()
    val df = read().filter(col("name") === "c")
    assert(df.select("id").collect().map(_.getLong(0)).toSeq == Seq(3L))
    val scanCalls = FakeODataFetcher.calls.toArray(Array.empty[String])
      .filter(_.contains("$filter="))
    assert(scanCalls.nonEmpty)
    assert(scanCalls.forall(_.contains("name eq 'c'")))
  }

  test("column pruning becomes \\$select") {
    FakeODataFetcher.calls.clear()
    val names = read().select("name").collect().map(_.getString(0))
    assert(names.sorted.toSeq == Seq("a", "b", "c", "d", "e"))
    val scanCalls = FakeODataFetcher.calls.toArray(Array.empty[String])
      .filter(_.contains("$select="))
    assert(scanCalls.nonEmpty, "no request carried $select")
    assert(scanCalls.forall(_.contains("$select=name")))
  }

  test("a nested-column projection derives $expand for the navigation " +
    "property (and keeps $select to the plain fields)") {
    import org.apache.spark.sql.types._
    NavPropFetcher.calls.clear()
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("iteration", StructType(Seq(
        StructField("path", StringType),
        StructField("start", StringType))))))
    val df = spark.read
      .format(classOf[ODataSource].getName)
      .schema(schema)
      .option("url", "http://nav/items")
      .option("fetcher", classOf[NavPropFetcher].getName)
      .load()
      .select(col("id"), col("iteration.path").as("path"))
    val rows = df.collect()
    // the fake service omits the nav property without $expand, so
    // non-null paths prove the derived clause reached the wire
    assert(rows.map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
    assert(rows.map(_.getString(1)).sorted.toSeq ==
      Seq("sprint-1", "sprint-2", "sprint-3"))
    val scanCalls = NavPropFetcher.calls.toArray(Array.empty[String])
    assert(scanCalls.exists(_.contains("$expand=iteration")),
      s"no request carried \\$$expand: ${scanCalls.mkString(" | ")}")
    // the nav property rides $expand, not $select
    assert(scanCalls.filter(_.contains("$select="))
      .forall(u => !u.contains("$select=iteration") &&
        !u.contains(",iteration")))
  }

  test("a user-pinned expand merges with the derived one (no dup)") {
    import org.apache.spark.sql.types._
    NavPropFetcher.calls.clear()
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("iteration", StructType(Seq(
        StructField("path", StringType))))))
    spark.read
      .format(classOf[ODataSource].getName)
      .schema(schema)
      .option("url", "http://nav/items")
      .option("fetcher", classOf[NavPropFetcher].getName)
      .option("expand", "iteration")
      .load()
      .select("iteration.path").collect()
    val expands = NavPropFetcher.calls.toArray(Array.empty[String])
      .flatMap(u => "\\$expand=([^&]*)".r.findFirstMatchIn(u)
        .map(_.group(1)))
    assert(expands.nonEmpty)
    assert(expands.forall(_ == "iteration"), expands.mkString(" | "))
  }

  test("count(*) over a pruned-to-empty schema still pages correctly") {
    val n = read().count()
    assert(n == 5L)
  }

  test("known count plans parallel skip/top partitions") {
    FakeODataFetcher.calls.clear()
    val df = spark.read
      .format(classOf[ODataSource].getName)
      .option("url", "http://fake/items")
      .option("fetcher", classOf[FakeODataFetcher].getName)
      .option("count", "5").option("pageSize", "2")
      .load()
    assert(df.rdd.getNumPartitions == 3) // ceil(5/2)
    assert(df.count() == 5)
    val scans = FakeODataFetcher.calls.toArray(Array.empty[String])
      .filter(_.contains("$skip="))
    assert(scans.exists(_.contains("$skip=0&$top=2")))
    assert(scans.exists(_.contains("$skip=2&$top=2")))
    assert(scans.exists(_.contains("$skip=4&$top=2")))
  }

  test("short name registration and uniform composition") {
    val df = spark.read.format("graft-odata")
      .option("url", "http://fake/items")
      .option("fetcher", classOf[FakeODataFetcher].getName)
      .load()
    val uni = graft.sources.Ingest.uniform(df)
    assert(uni.count() == 5)
  }

  test("pushed values are percent-encoded on the wire (legal URI)") {
    FakeODataFetcher.calls.clear()
    read().filter(col("size") > 20).count()
    val wire = FakeODataFetcher.calls.toArray(Array.empty[String])
    // every recorded (decoded) scan URL must round-trip from a URI the
    // default HttpFetcher could actually send: spaces arrive as %20
    assert(wire.exists(_.contains("$filter=")))
    // the raw fetcher argument was legal — java.net.URI.create must not
    // throw on what pageUrl builds
    import graft.sources.ODataOptionsAccess._
    val u = pageUrl(Map("url" -> "http://fake/items"),
      Some("(size ne null) and (size gt 20)"), Seq("id", "name"))
    java.net.URI.create(u) // throws on raw spaces
    assert(u.contains("%20") && !u.contains(" "))
  }

  test("user-pinned select widens to required columns (residual filter " +
    "can evaluate)") {
    // without an explicit schema, a pinned select IS the table schema and
    // filtering an unselected column fails analysis (loud — fine). The
    // silent-NULL hazard needs a user-supplied full schema + a narrower
    // pinned select: the scan must widen the wire $select or the
    // residual filter sees server-omitted NULLs and drops every row.
    import org.apache.spark.sql.types._
    val full = StructType(Seq(StructField("id", LongType),
      StructField("name", StringType), StructField("size", LongType)))
    FakeODataFetcher.calls.clear()
    val df = spark.read
      .format(classOf[ODataSource].getName)
      .schema(full)
      .option("url", "http://fake/items")
      .option("fetcher", classOf[FakeODataFetcher].getName)
      .option("select", "id,name")
      .load()
    val rows = df.filter(col("size") > 20)
      .select("id").orderBy("id").collect().map(_.getLong(0))
    assert(rows.toSeq == Seq(2L, 3L, 5L),
      "a narrower pinned $select must not starve the residual filter")
    val sel = FakeODataFetcher.calls.toArray(Array.empty[String])
      .filter(_.contains("$select="))
    assert(sel.exists(_.contains("size")),
      "the scan request must fetch the residual filter's column")
  }

  test("a server that caps \\$top below pageSize loses no rows in " +
    "parallel mode (nextLink continuation inside the window)") {
    CappedTopFetcher.calls.clear()
    val df = spark.read
      .format(classOf[ODataSource].getName)
      .option("url", "http://capped/items")
      .option("fetcher", classOf[CappedTopFetcher].getName)
      .option("count", "10").option("pageSize", "5")
      .load()
    val ids = df.select("id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == (0L until 10L),
      s"capped-\\$$top server must still yield every row once, got " +
        ids.mkString(","))
    assert(df.rdd.getNumPartitions == 2)
  }

  test("an error payload without the row array fails loudly, not as an " +
    "empty page") {
    val df = spark.read
      .format(classOf[ODataSource].getName)
      .option("url", "http://err/items")
      .option("fetcher", classOf[ErrorPayloadFetcher].getName)
      .option("count", "4").option("pageSize", "2")
      .load()
    val e = intercept[org.apache.spark.SparkException] { df.count() }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c =>
      String.valueOf(c.getMessage).contains("has no 'value' array")))
  }

  test("date predicates push down as ISO-8601 \\$filter literals " +
    "(LogicCycleTime.hb:5 shape) and results stay exact") {
    DateFeedFetcher.calls.clear()
    val df = spark.read
      .format(classOf[ODataSource].getName)
      .option("url", "http://fake/dated")
      .option("fetcher", classOf[DateFeedFetcher].getName)
      .schema("id BIGINT, day DATE")
      .load()
      .filter(col("day") > lit(java.sql.Date.valueOf("2019-01-03")))
    assert(df.select("id").orderBy("id").collect().map(_.getLong(0)).toSeq
      == Seq(4L, 5L, 6L))
    val scanCalls = DateFeedFetcher.calls.toArray(Array.empty[String])
      .filter(_.contains("$filter="))
    assert(scanCalls.nonEmpty, "no request carried the pushed date $filter")
    assert(scanCalls.forall(_.contains("day gt 2019-01-03")))
  }

  test("filter translation covers the dialect; untranslatable stays out") {
    import org.apache.spark.sql.sources._
    import graft.sources.ODataFiltersAccess._
    assert(tr(EqualTo("a", "x'y")) == Some("a eq 'x''y'"))
    assert(tr(And(GreaterThan("a", 1), LessThanOrEqual("b", 2.5))) ==
      Some("(a gt 1) and (b le 2.5)"))
    assert(tr(Or(IsNull("a"), Not(EqualTo("b", false)))) ==
      Some("(a eq null) or (b ne false)"))
    assert(tr(In("a", Array(1, 2))) == Some("(a eq 1) or (a eq 2)"))
    assert(tr(EqualTo("nested.path", 1)).isEmpty)
    assert(tr(StringContains("a", "x")).isEmpty)
    // temporal literals: bare ISO-8601, the Edm.Date/Edm.DateTimeOffset
    // dialect (both the java.sql and java.time shapes Spark can hand us)
    assert(tr(GreaterThan("d", java.sql.Date.valueOf("2019-01-01"))) ==
      Some("d gt 2019-01-01"))
    assert(tr(GreaterThan("d", java.time.LocalDate.of(2019, 1, 1))) ==
      Some("d gt 2019-01-01"))
    assert(tr(LessThan("t",
      java.sql.Timestamp.from(java.time.Instant.parse("2019-01-01T10:30:00Z"))))
      == Some("t lt 2019-01-01T10:30:00Z"))
    assert(tr(LessThan("t", java.time.Instant.parse("2019-01-01T10:30:00.123456Z")))
      == Some("t lt 2019-01-01T10:30:00.123456Z"))
    // a sub-microsecond remainder must NOT truncate (an upper bound or
    // equality would under-fetch rows in (truncated, actual) that the
    // residual can never bring back) — residual-only instead
    assert(tr(LessThan("t",
      java.time.Instant.parse("2019-01-01T10:30:00.123456789Z"))).isEmpty)
    assert(tr(LessThan("t", java.sql.Timestamp.from(
      java.time.Instant.parse("2019-01-01T10:30:00.000000001Z")))).isEmpty)
    // binary still stays residual-only
    assert(tr(EqualTo("b", Array[Byte](1, 2))).isEmpty)
  }

  test("fixture end-to-end over real loopback HTTP: pagination chain, " +
      "server-side $filter pruning, $select column pruning") {
    import spark.implicits._
    val df = (1L to 500L).map(i =>
      (i, s"name_$i it's 'quoted' \" and \\ unicode é", i % 7 == 0,
        i.toDouble / 3.0)).toDF("id", "name", "flag", "score")
    val url = graft.sources.ODataFixture.serve(df, "spec_items",
      pageCap = 40)
    graft.sources.ODataFixture.resetStats("spec_items")
    // filtered + pruned read through the DEFAULT HttpFetcher
    // no orderBy here: a global sort adds a range-partitioner SAMPLING
    // pass (a second wire scan) that would double the counters below —
    // sort driver-side instead
    val out = spark.read.format("graft-odata")
      .schema(df.schema)
      .option("url", url)
      .load()
      .filter(col("id") > 300L)
      .select("id", "name")
      .collect().sortBy(_.getLong(0))
    val expect = df.filter(col("id") > 300L).select("id", "name")
      .orderBy("id").collect()
    assert(out.toSeq == expect.toSeq) // adversarial strings survive JSON
    val (reqs, rowsServed) = graft.sources.ODataFixture.stats("spec_items")
    // server honored $filter: only the 200 matching rows crossed the
    // wire (not 500) — pushdown reached the service
    assert(rowsServed == 200L, s"rows served: $rowsServed")
    // pagination actually chained: 200 rows at pageCap 40 = 5 pages
    assert(reqs == 5L, s"requests: $reqs")
    // unfiltered unpruned read still correct (and serves everything)
    graft.sources.ODataFixture.resetStats("spec_items")
    assert(spark.read.format("graft-odata").schema(df.schema)
      .option("url", url).load().count() == 500L)
    assert(graft.sources.ODataFixture.stats("spec_items")._2 == 500L)
  }
}
