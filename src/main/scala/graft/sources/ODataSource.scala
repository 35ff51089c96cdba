package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.json.{CreateJacksonParser, JSONOptions, JacksonParser}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** OData as a DataSource V2 — beyond-parity with the reference, whose
  * OData provider is a driver-side pager (tools/visualizer/cli/src/
  * ODataProvider.fs:70-105). Spark-first version of the same protocol:
  *
  *  - `SupportsPushDownFilters`: Catalyst predicates translate to the
  *    OData `$filter` dialect (`eq/ne/gt/ge/lt/le`, `and`/`or`) and ride
  *    the request URL, so the SERVER prunes rows before they ever cross
  *    the wire. Every filter is also kept as a residual (returned from
  *    `pushFilters`), so Spark re-applies it post-scan — a server that
  *    ignores `$filter` costs bandwidth, never correctness.
  *  - `SupportsPushDownRequiredColumns`: column pruning becomes
  *    `$select=…`, so a 2-column projection of a 40-field feed fetches
  *    2 fields (unless the user pinned an explicit `select` option).
  *  - Fetch + JSON parse run on EXECUTORS (the reference pages on the
  *    driver): by default one partition walks `@odata.nextLink`
  *    (server-driven paging is inherently sequential), and when the
  *    caller knows the row count (`count` option, e.g. from
  *    `$count=true`) the scan plans `ceil(count/pageSize)` independent
  *    `$skip/$top` partitions that page in PARALLEL across the cluster.
  *    Parallel mode requires a server that honors `$skip` (standard
  *    OData); a server that CAPS `$top` below `pageSize` is handled —
  *    each partition follows the continuation nextLink until its window
  *    is full. For continuation-token-only services keep the default
  *    sequential mode.
  *
  * Usage:
  * {{{
  * spark.read.format("graft-odata")       // or classOf[ODataSource].getName
  *   .option("url", "https://host/feed")
  *   .option("fetcher", classOf[MyFetcher].getName) // no-arg Providers.Fetcher
  *   .option("count", "100000").option("pageSize", "10000") // opt-in ∥ paging
  *   .load()
  * }}}
  *
  * The raw payload schema (inferred from the first page, or supplied via
  * `.schema(...)`) is what pushdown sees; apply `Ingest.uniform` after
  * the scan for the hobbes flatten/type-infer pass. Auth: `user`/`pwd`
  * options (BasicAuth, `$VAR` resolves from the environment like the
  * header provider).
  */
class ODataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-odata"

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val opts = ODataOptions(options.asCaseSensitiveMap().asScala.toMap)
    val body = opts.fetcher.get(opts.pageUrl(None, Nil), opts.auth)
    val spark = SparkSession.active
    import spark.implicits._
    val parsed = spark.read.json(Seq(body).toDS())
    parsed.schema.find(_.name == opts.valuesProp) match {
      case Some(StructField(_, ArrayType(st: StructType, _), _, _)) => st
      case _ => throw new IllegalArgumentException(
        s"first page has no '${opts.valuesProp}' row array; " +
          s"fields: ${parsed.schema.fieldNames.mkString(",")}")
    }
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new ODataTable(schema, ODataOptions(properties.asScala.toMap))
}

private[sources] final case class ODataOptions(raw: Map[String, String]) {
  private val m = raw.map { case (k, v) => k.toLowerCase -> v }
  val url: String = m.getOrElse("url",
    throw new IllegalArgumentException("graft-odata requires a 'url' option"))
  val select: Option[String] = m.get("select")
  val filter: Option[String] = m.get("filter")
  val expand: Option[String] = m.get("expand")
  val valuesProp: String = m.getOrElse("values", "value")
  val fetcherClass: String =
    m.getOrElse("fetcher", classOf[HttpFetcher].getName)
  val maxPages: Int = m.getOrElse("maxpages", "10000").toInt
  val pageSize: Int = m.getOrElse("pagesize", "10000").toInt
  /** Total row count, if the caller knows it — enables parallel
    * `$skip/$top` partitions instead of sequential nextLink paging. */
  val count: Option[Long] = m.get("count").map(_.toLong)
  val auth: Option[(String, String)] = for {
    u <- m.get("user"); p <- m.get("pwd")
  } yield (ODataOptions.env(u), ODataOptions.env(p))

  def fetcher: Providers.Fetcher = Class.forName(fetcherClass)
    .getDeclaredConstructor().newInstance()
    .asInstanceOf[Providers.Fetcher]

  /** Assemble a page URL (values percent-encoded via the shared
    * Providers helpers); `pushedFilter` ANDs with the user filter.
    * `requiredCols` are the columns the QUERY needs: a user-pinned
    * `select` is widened to include them — honoring a narrower pin
    * would make the residual filters evaluate against NULLs and
    * silently drop every row. `requiredExpand` are the navigation
    * (struct-typed) properties the query needs: OData omits navigation
    * properties unless `$expand` names them, so they merge into the
    * user-pinned expand the same way — the derived form of the
    * `$expand` clause the reference assembles by hand
    * (tools/visualizer/cli/src/ODataProvider.fs:89-105). */
  def pageUrl(pushedFilter: Option[String], requiredCols: Seq[String],
      skipTop: Option[(Long, Long)] = None,
      requiredExpand: Seq[String] = Nil): String = {
    val sel = select match {
      case Some(u) if requiredCols.nonEmpty =>
        val pinned = u.split(",").map(_.trim).filter(_.nonEmpty)
        Some((pinned ++ requiredCols.filterNot(pinned.toSet)).mkString(","))
      case Some(u) => Some(u)
      case None =>
        if (requiredCols.nonEmpty) Some(requiredCols.mkString(","))
        else None
    }
    val fil = (filter, pushedFilter) match {
      case (Some(u), Some(p)) => Some(s"($u) and ($p)")
      case (u, p) => u.orElse(p)
    }
    val exp = {
      val pinned = expand.toSeq
        .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
      val merged = pinned ++ requiredExpand.filterNot(pinned.toSet)
      if (merged.isEmpty) None else Some(merged.mkString(","))
    }
    Providers.withQuery(url,
      Providers.odataQuery(sel, fil, exp, skipTop))
  }
}

private[sources] object ODataOptions {
  def env(v: String): String =
    if (v.startsWith("$")) sys.env.getOrElse(v.drop(1), v) else v
}

/** Production fetcher with a no-arg constructor (DSv2 options carry only
  * strings, so fetchers are named by class and built reflectively on the
  * executor). */
class HttpFetcher extends Providers.Fetcher {
  def get(url: String, auth: Option[(String, String)]): String =
    Providers.Fetcher.http.get(url, auth)
}

private final class ODataTable(schema: StructType, opts: ODataOptions)
    extends Table with SupportsRead {
  override def name(): String = s"odata(${opts.url})"
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new ODataScanBuilder(schema, opts)
}

private final class ODataScanBuilder(fullSchema: StructType,
    opts: ODataOptions) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = fullSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(f => ODataFilters.translate(f).isDefined)
    // every filter stays a residual: server-side $filter is a transfer
    // optimization, Spark re-evaluates for correctness
    filters
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new ODataScan(fullSchema, required, pushed, opts)
}

private final class ODataScan(fullSchema: StructType, required: StructType,
    pushed: Array[Filter], opts: ODataOptions) extends Scan with Batch {

  override def readSchema(): StructType = required

  override def description(): String = {
    val f = ODataFilters.combined(pushed).getOrElse("")
    s"graft-odata ${opts.url} pushedFilter=[$f] " +
      s"select=[${required.fieldNames.mkString(",")}]"
  }

  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val pushedFilter = ODataFilters.combined(pushed)
    // Which columns must reach the wire request: with no user-pinned
    // select, push $select only when pruning is real (a pruned-to-empty
    // schema — count(*) — still needs one field to page, and an unpruned
    // read needs no $select at all). With a PINNED select, the required
    // columns must always widen it — even unpruned reads (e.g. load()
    // .filter(...) over the full schema) would otherwise evaluate their
    // residual filters against server-omitted NULLs.
    // Navigation (struct-typed) properties ride `$expand`, not
    // `$select`: OData services omit them unless expanded, so ANY read
    // that needs a nested column derives its $expand here — the
    // user-pinned `expand` option stays as the escape hatch for
    // services with non-property expansion names.
    val nestedNames: Set[String] = required.fields.collect {
      case StructField(n, _: StructType, _, _) => n
      case StructField(n, ArrayType(_: StructType, _), _, _) => n
    }.toSet
    val requiredExpand: Seq[String] =
      required.fieldNames.toSeq.filter(nestedNames) // schema order
    val plainFields = required.fieldNames.toSeq.filterNot(nestedNames)
    val requiredCols: Seq[String] =
      if (required.isEmpty) Nil
      else if (opts.select.isEmpty && required.length == fullSchema.length)
        Nil
      else plainFields
    opts.count match {
      case Some(n) if n > 0 =>
        val pages = (n + opts.pageSize - 1) / opts.pageSize
        // the caller DECLARED the row count, so hitting the page cap is
        // detectable truncation — fail, never silently shrink the dataset
        require(pages <= opts.maxPages.toLong,
          s"count=$n needs $pages pages of ${opts.pageSize} " +
            s"> maxPages=${opts.maxPages}; raise pageSize or maxPages")
        (0L until pages).map { i =>
          // maxRows caps the partition at its $top window: a server that
          // CAPS $top below pageSize answers with a partial page plus a
          // nextLink continuation, which the reader follows until the
          // window is full — no silent loss (requires the server to
          // honor $skip; one that ignores it would duplicate rows in
          // any client-paged design)
          ODataPartition(
            opts.pageUrl(pushedFilter, requiredCols,
              Some((i * opts.pageSize, opts.pageSize.toLong)),
              requiredExpand),
            maxRows = opts.pageSize.toLong): InputPartition
        }.toArray
      case _ =>
        Array(ODataPartition(
          opts.pageUrl(pushedFilter, requiredCols,
            requiredExpand = requiredExpand),
          maxRows = Long.MaxValue))
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ODataReaderFactory(required, opts.valuesProp, opts.fetcherClass,
      opts.auth, opts.maxPages)
}

private final case class ODataPartition(firstUrl: String,
    maxRows: Long) extends InputPartition

private final class ODataReaderFactory(schema: StructType,
    valuesProp: String, fetcherClass: String,
    auth: Option[(String, String)], maxPages: Int)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new ODataPartitionReader(p.asInstanceOf[ODataPartition], schema,
      valuesProp, fetcherClass, auth, maxPages)
}

/** Executor-side reader: fetches its page(s), parses each body with the
  * catalyst Jackson parser against struct<valuesProp: array<readSchema>>,
  * and streams the array elements out as InternalRows. */
private final class ODataPartitionReader(part: ODataPartition,
    schema: StructType, valuesProp: String, fetcherClass: String,
    auth: Option[(String, String)], maxPages: Int)
    extends PartitionReader[InternalRow] {

  private val fetcher = Class.forName(fetcherClass)
    .getDeclaredConstructor().newInstance()
    .asInstanceOf[Providers.Fetcher]

  // parse with ≥1 field so Jackson has something to bind; a
  // pruned-to-empty readSchema (count(*)) emits empty rows
  private val parseFields =
    if (schema.nonEmpty) schema else StructType(Seq(StructField("__probe",
      StringType)))
  private val pageSchema =
    StructType(Seq(StructField(valuesProp, ArrayType(parseFields))))
  private val parser = new JacksonParser(pageSchema,
    new JSONOptions(Map.empty[String, String], "UTC"),
    allowArrayAsStructs = false)

  private var nextUrl: Option[String] = Some(part.firstUrl)
  private var pagesRead = 0
  private var emitted = 0L
  private var rows: Iterator[InternalRow] = Iterator.empty
  private var current: InternalRow = _

  private def loadNextPage(): Boolean = nextUrl match {
    case Some(u) if pagesRead < maxPages =>
      val body = fetcher.get(u, auth)
      pagesRead += 1
      // always follow @odata.nextLink: in $skip/$top mode a server that
      // caps $top answers with a partial window + continuation, and the
      // maxRows cap (next()) keeps the partition inside its window
      nextUrl = Providers.nextLink(body)
      val parsed = parser.parse[String](body, CreateJacksonParser.string,
        org.apache.spark.unsafe.types.UTF8String.fromString)
      rows = parsed.iterator.flatMap { page =>
        if (page.isNullAt(0))
          // a body WITHOUT the row array is an error payload, not an
          // empty page (an empty page is "value": []) — fail loudly
          // rather than end the partition early with partial data
          throw new IllegalStateException(
            s"OData page from $u has no '$valuesProp' array: " +
              body.take(200))
        else {
          val arr = page.getArray(0)
          (0 until arr.numElements()).iterator.map { i =>
            if (schema.isEmpty) new GenericInternalRow(0)
            else if (arr.isNullAt(i)) new GenericInternalRow(schema.length)
            else arr.getStruct(i, schema.length).copy(): InternalRow
          }
        }
      }
      true
    case _ => false
  }

  override def next(): Boolean = {
    if (emitted >= part.maxRows) return false
    while (!rows.hasNext) if (!loadNextPage()) return false
    current = rows.next()
    emitted += 1
    true
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}

/** Catalyst `Filter` → OData `$filter` dialect. Only top-level
  * attributes (no dots) and atomic literals translate; anything else is
  * left for Spark's residual evaluation. */
private[sources] object ODataFilters {

  def combined(filters: Array[Filter]): Option[String] = {
    val parts = filters.flatMap(translate)
    if (parts.isEmpty) None
    else Some(parts.map(p => s"($p)").mkString(" and "))
  }

  def translate(f: Filter): Option[String] = f match {
    case EqualTo(a, v) => cmp(a, "eq", v)
    case GreaterThan(a, v) => cmp(a, "gt", v)
    case GreaterThanOrEqual(a, v) => cmp(a, "ge", v)
    case LessThan(a, v) => cmp(a, "lt", v)
    case LessThanOrEqual(a, v) => cmp(a, "le", v)
    case IsNull(a) if simple(a) => Some(s"$a eq null")
    case IsNotNull(a) if simple(a) => Some(s"$a ne null")
    case Not(EqualTo(a, v)) => cmp(a, "ne", v)
    case And(l, r) =>
      for { ls <- translate(l); rs <- translate(r) }
        yield s"($ls) and ($rs)"
    case Or(l, r) =>
      for { ls <- translate(l); rs <- translate(r) }
        yield s"($ls) or ($rs)"
    case In(a, vs) if simple(a) && vs.nonEmpty &&
        vs.forall(v => lit(v).isDefined) =>
      Some(vs.flatMap(v => lit(v).map(l => s"$a eq $l"))
        .map(p => s"($p)").mkString(" or "))
    case _ => None
  }

  private def cmp(a: String, op: String, v: Any): Option[String] =
    if (!simple(a)) None else lit(v).map(l => s"$a $op $l")

  /** Top-level plain identifiers only — nested paths and exotic names
    * stay residual-only. */
  private def simple(a: String): Boolean =
    a.nonEmpty && a.forall(c => c.isLetterOrDigit || c == '_')

  private def lit(v: Any): Option[String] = v match {
    case null => Some("null")
    case s: String => Some(s"'${s.replace("'", "''")}'")
    case s: org.apache.spark.unsafe.types.UTF8String =>
      Some(s"'${s.toString.replace("'", "''")}'")
    case b: Boolean => Some(b.toString)
    case n @ (_: Byte | _: Short | _: Int | _: Long) => Some(n.toString)
    case d: Double => Some(d.toString)
    case f: Float => Some(f.toString)
    case d: java.math.BigDecimal => Some(d.toString)
    // Date/timestamp: OData v4 Edm.Date / Edm.DateTimeOffset take bare
    // ISO-8601 literals — the dialect the reference's feeds filter with
    // (`Iteration/StartDate gt 2019-01-01Z`, tests/transformations/
    // LogicCycleTime.hb:5; assembled at tools/visualizer/cli/src/
    // ODataProvider.fs:89-105). Dates filtering the most common
    // production predicate used to stay residual-only and fetch the
    // whole feed. The filter remains in the residual (pushdown() keeps
    // every translated filter post-evaluated), so a service speaking a
    // different date dialect can over-return but never corrupt results.
    case d: java.sql.Date => Some(d.toString) // yyyy-MM-dd
    case t: java.sql.Timestamp => instantLiteral(t.toInstant)
    case d: java.time.LocalDate => Some(d.toString)
    case i: java.time.Instant => instantLiteral(i)
    case _ => None // binary etc: format varies by service
  }

  /** UTC instant literal, micros precision, trailing Z. A value with a
    * sub-microsecond remainder is NOT truncated: the comparison direction
    * is unknown at literal-conversion time, so truncating an upper bound
    * or equality would make the service exclude rows in
    * (truncated, actual) that the post-evaluated residual can never
    * recover. Those rare values stay residual-only (None) — over-fetch,
    * never under-fetch. */
  private def instantLiteral(i: java.time.Instant): Option[String] =
    if (i.getNano % 1000 != 0) None
    else Some(java.time.format.DateTimeFormatter.ISO_INSTANT.format(i))
}
