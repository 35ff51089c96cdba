package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.hb.Ast.Header

/** Source providers (SURVEY §2.1).
  *
  * The reference fetches driver-side and pages manually
  * (tools/visualizer/cli/src/ODataProvider.fs:70-105 — `$select`/`$filter`
  * assembled into the URL, pagination via `@odata.nextLink`;
  * tools/visualizer/web/src/Server/Reader.fs:105-147 — REST with a URL
  * list concatenated and an optional `values` payload property). The same
  * shape here: a pluggable `Fetcher` does the HTTP GET (tests inject a
  * fake; production uses `Fetcher.http`), pages land in `spark.read.json`,
  * and the result goes through the uniforming pass (flatten + type-infer).
  *
  * Scale note: fetching is inherently driver-side in the reference design
  * ($top=10000-capped APIs); the Spark-side cost — parse, flatten, infer —
  * is distributed. For bulk sources use the parquet provider.
  */
object Providers {

  /** One HTTP GET. `auth` = (user, password) for BasicAuth. */
  trait Fetcher {
    def get(url: String, auth: Option[(String, String)]): String
  }

  object Fetcher {
    /** java.net.http-based implementation for production use. Fails loudly
      * on HTTP errors — a 429/500 body must never be parsed as an empty
      * page (silent data loss). */
    val http: Fetcher = new Fetcher {
      def get(url: String, auth: Option[(String, String)]): String = {
        val client = java.net.http.HttpClient.newHttpClient()
        val b = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
        auth.foreach { case (u, p) =>
          val tok = java.util.Base64.getEncoder
            .encodeToString(s"$u:$p".getBytes("UTF-8"))
          b.header("Authorization", s"Basic $tok")
        }
        val resp = client.send(b.build(),
          java.net.http.HttpResponse.BodyHandlers.ofString())
        if (resp.statusCode() >= 400)
          throw new java.io.IOException(
            s"HTTP ${resp.statusCode()} from $url: " +
              resp.body().take(200))
        resp.body()
      }
    }
  }

  /** Percent-encode a query VALUE (RFC 3986 form: space → %20, so OData
    * filters like `Number gt 1` produce a legal URI). */
  private[sources] def enc(v: String): String =
    java.net.URLEncoder.encode(v, "UTF-8").replace("+", "%20")

  /** Assemble the OData query string (shared by the driver-side pager and
    * the DataSource V2 scan). */
  private[sources] def odataQuery(select: Option[String],
      filter: Option[String], expand: Option[String],
      skipTop: Option[(Long, Long)] = None): String =
    (Seq(
      select.map(s => s"$$select=${enc(s)}"),
      filter.map(f => s"$$filter=${enc(f)}"),
      expand.map(e => s"$$expand=${enc(e)}")) ++
      skipTop.toSeq.flatMap { case (skip, top) =>
        Seq(Some(s"$$skip=$skip"), Some(s"$$top=$top")) })
      .flatten.mkString("&")

  private[sources] def withQuery(url: String, q: String): String =
    if (q.isEmpty) url
    else if (url.endsWith("?") || url.endsWith("&")) url + q
    else if (url.contains("?")) s"$url&$q"
    else s"$url?$q"

  /** S1 — OData v2 scan: `$select`/`$filter`/`$expand` from the header,
    * pagination via `@odata.nextLink`, payload rows in `value`.
    * `select`/`filter`/`expand` are RAW (unencoded) values — the query
    * assembly percent-encodes them (a raw space previously made the
    * default fetcher's URI.create throw); do NOT pass pre-encoded
    * strings or they arrive double-encoded. */
  def odata(spark: SparkSession, url: String,
      select: Option[String] = None, filter: Option[String] = None,
      expand: Option[String] = None, auth: Option[(String, String)] = None,
      fetch: Fetcher = Fetcher.http, maxPages: Int = 10000): DataFrame = {
    val first = withQuery(url, odataQuery(select, filter, expand))
    val pages = scala.collection.mutable.ArrayBuffer[String]()
    var next: Option[String] = Some(first)
    while (next.isDefined && pages.size < maxPages) {
      val body = fetch.get(next.get, auth)
      pages += body
      next = nextLink(body)
    }
    val rows = arrayProperty(spark, pages.toSeq, "value")
    Ingest.uniform(rows)
  }

  /** S2 — generic JSON-over-HTTP: one URL or a list (concatenated),
    * optional `values` property selecting the payload array. */
  def rest(spark: SparkSession, urls: Seq[String],
      valuesProp: Option[String] = None,
      auth: Option[(String, String)] = None,
      fetch: Fetcher = Fetcher.http): DataFrame = {
    val bodies = urls.map(u => fetch.get(u, auth))
    val rows = valuesProp match {
      case Some(p) => arrayProperty(spark, bodies, p)
      case None =>
        import spark.implicits._
        spark.read.json(bodies.toDS())
    }
    Ingest.uniform(rows)
  }

  /** S4 — git provider. The reference keeps COLLECTION out of the engine
    * (workers/git.worker clones and walks repos; tools/workbench/src/
    * Types.fs:83-90 declares the provider) and feeds rows onward; the
    * same split here. Collect commits into JSON lines with one command —
    *
    * {{{
    * git log --date=iso-strict --pretty=format:'{"commit":"%H","author":"%an","email":"%ae","date":"%ad","subject":"%f","parents":"%P"}' > commits.jsonl
    * }}}
    *
    * (`%f` is git's sanitized subject — no quotes or newlines, so each
    * line is valid JSON) — then ingest the file (or a directory of
    * per-repo files; the parse is distributed) through the uniforming
    * pass like every other provider.
    *
    * Caveat: `%an`/`%ae` are NOT sanitized — an author name containing
    * `"` or `\` produces an invalid JSON line. The read runs FAILFAST so
    * such a line aborts loudly instead of being silently routed to
    * `_corrupt_record` and dropping the commit; if your history has such
    * authors, wrap the collector in a JSON-escaping step (e.g. `git log
    * -z` piped through `jq -R`). */
  def gitLog(spark: SparkSession, jsonlPath: String): DataFrame =
    Ingest.uniform(spark.read.option("mode", "FAILFAST").json(jsonlPath))

  /** Resolve a parsed `.hb` header to a DataFrame (the provider dispatch
    * of the sync worker, workers/syncronization.worker/src/Program.fs:48-58).
    * `fetch` injects the HTTP layer; `dataDir` grounds the parquet/test
    * providers. */
  def fromHeader(spark: SparkSession, h: Header, dataDir: String = ".",
      fetch: Fetcher = Fetcher.http, resolveEnv: Boolean = true): DataFrame = {
    val auth = for {
      u <- h.props.get("user"); p <- h.props.get("pwd")
    } yield
      if (resolveEnv) (envValue(u), envValue(p)) else (u, p)
    h.props.getOrElse("provider", "parquet") match {
      case "odata" =>
        odata(spark, h.props("url"), h.props.get("select"),
          h.props.get("filter"), h.props.get("expand"), auth, fetch)
      case "rest" =>
        val urls = h.lists.getOrElse("url",
          h.props.get("url").toSeq)
        rest(spark, urls, h.props.get("values"), auth, fetch)
      case "parquet" =>
        val path = h.props.get("path")
          .getOrElse(s"$dataDir/${h.props("table")}.parquet")
        Ingest.normalizeNanos(spark.read.parquet(path))
      case "git" =>
        gitLog(spark, h.props.getOrElse("path", s"$dataDir/commits.jsonl"))
      case other =>
        // jira: declared but unimplemented in the reference too
        // (tools/workbench/src/Types.fs:128-129)
        throw new IllegalArgumentException(s"unsupported provider '$other'")
    }
  }

  /** `$VAR` header values resolve from the environment
    * (`user: $AZURE_DEVOPS_PAT` pattern in every corpus program).
    * Library-use default; callers serving UNTRUSTED uploaded headers
    * (the Gateway) pass `resolveEnv = false` — a client-chosen header
    * could otherwise name any env var (the master key included) as
    * `user:`/`pwd:` and receive it as basic auth at a client-chosen
    * `url`, an environment-exfiltration channel. */
  private def envValue(v: String): String =
    if (v.startsWith("$")) sys.env.getOrElse(v.drop(1), v) else v

  /** Pull `prop` (an array of row objects) out of each JSON body. */
  private def arrayProperty(spark: SparkSession, bodies: Seq[String],
      prop: String): DataFrame = {
    import spark.implicits._
    val parsed = spark.read.json(bodies.toDS())
    if (!parsed.columns.contains(prop))
      throw new IllegalArgumentException(
        s"payload has no '$prop' array; fields: ${parsed.columns.mkString(",")}")
    parsed.select(explode(col(s"`$prop`")).as("__row")).select("__row.*")
  }

  /** Extract `@odata.nextLink` from a page without a full JSON parse —
    * driver-side, one small regex per page. */
  def nextLink(body: String): Option[String] = {
    val re = """"@odata\.nextLink"\s*:\s*"((?:[^"\\]|\\.)*)"""".r
    re.findFirstMatchIn(body).map(m =>
      m.group(1).replace("\\/", "/").replace("\\\"", "\""))
  }
}
