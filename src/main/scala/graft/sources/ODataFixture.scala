package graft.sources

import java.util.concurrent.atomic.AtomicLong

import scala.collection.concurrent.TrieMap

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.StructType

/** In-process OData v4 service over a DataFrame — the correctness
  * fixture for the `graft-odata` DSv2 source in a ZERO-EGRESS sandbox:
  * an `com.sun.net.httpserver` endpoint (the Gateway's server) that
  * speaks the exact protocol slice the reference's provider consumes
  * (tools/visualizer/cli/src/ODataProvider.fs:70-105): `$select`
  * column pruning, the `$filter` comparison dialect
  * (`eq/ne/gt/ge/lt/le`, `and`/`or`, quoted strings with `''`
  * escapes), `$skip`/`$top` windows, and SERVER-DRIVEN PAGINATION —
  * every response is capped at `pageCap` rows and carries an
  * `@odata.nextLink` continuation while rows remain.
  *
  * The table is held driver-side BY DESIGN: the fixture plays the
  * EXTERNAL SERVICE (bounded, $top-capped feeds in the reference);
  * the Spark side — executor fetch, Jackson parse, pushdown — is the
  * real distributed reader under test. Request/row counters let specs
  * prove the server actually pruned (pushdown reached the wire), not
  * just that results match. */
object ODataFixture {

  private final case class Served(schema: StructType,
      rows: IndexedSeq[Row], pageCap: Int)

  private val tables = TrieMap.empty[String, Served]
  private val contexts = TrieMap.empty[String, Boolean]
  private val reqCount = TrieMap.empty[String, AtomicLong]
  private val rowCount = TrieMap.empty[String, AtomicLong]
  private val mapper = new ObjectMapper()

  private lazy val server: HttpServer = {
    val s = HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    s.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4,
      r => { val t = new Thread(r, "odata-fixture"); t.setDaemon(true); t }))
    // start() spawns the server's internal HTTP-Dispatcher thread,
    // which is NON-daemon and would pin the JVM open after a driver
    // main returns — spawn it from a daemon thread so it inherits
    // daemon status (thread daemon-ness is inherited from the creator)
    val starter = new Thread(() => s.start(), "odata-fixture-start")
    starter.setDaemon(true)
    starter.start()
    starter.join()
    s
  }

  /** Publish `df` (collected — the fixture IS the external service) at
    * `http://127.0.0.1:<port>/odata/<name>`; idempotent per name
    * (re-serving replaces the rows — gates re-run across bench reps). */
  def serve(df: DataFrame, name: String, pageCap: Int = 100): String = {
    require(pageCap >= 1, s"pageCap must be >= 1, got $pageCap")
    tables.put(name, Served(df.schema, df.collect().toIndexedSeq, pageCap))
    reqCount.getOrElseUpdate(name, new AtomicLong)
    rowCount.getOrElseUpdate(name, new AtomicLong)
    if (contexts.putIfAbsent(name, true).isEmpty)
      server.createContext(s"/odata/$name", new Handler(name))
    s"http://127.0.0.1:${server.getAddress.getPort}/odata/$name"
  }

  /** (requests answered, rows serialized) since the last reset — the
    * pushdown proof: a pruned read serves FEWER rows than the table. */
  def stats(name: String): (Long, Long) =
    (reqCount.get(name).map(_.get()).getOrElse(0L),
      rowCount.get(name).map(_.get()).getOrElse(0L))

  def resetStats(name: String): Unit = {
    reqCount.get(name).foreach(_.set(0L))
    rowCount.get(name).foreach(_.set(0L))
  }

  private final class Handler(name: String) extends HttpHandler {
    override def handle(ex: HttpExchange): Unit =
      try {
        val t = tables(name)
        val q = params(ex)
        reqCount(name).incrementAndGet()
        val filtered = q.get("$filter").flatMap(FixtureFilter.parse) match {
          case Some(pred) => t.rows.filter(r => pred(t.schema, r))
          case None => t.rows
        }
        val skip = q.get("$skip").map(_.toLong).getOrElse(0L)
        val top = q.get("$top").map(_.toLong).getOrElse(Long.MaxValue)
        val page = filtered.iterator.drop(skip.toInt)
          .take(math.min(top, t.pageCap.toLong).toInt).toVector
        val remaining = filtered.size - skip - page.size
        val sel = q.get("$select")
          .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        val body = render(t.schema, page, sel,
          if (remaining > 0 && page.size < top) {
            // continuation: same filter/select, window advanced
            val qs = Seq(
              q.get("$select").map(s => s"$$select=${Providers.enc(s)}"),
              q.get("$filter").map(f => s"$$filter=${Providers.enc(f)}"),
              Some(s"$$skip=${skip + page.size}")) ++
              (if (top == Long.MaxValue) Nil
               else Seq(Some(s"$$top=${top - page.size}")))
            Some(s"http://127.0.0.1:${server.getAddress.getPort}" +
              s"/odata/$name?" + qs.flatten.mkString("&"))
          } else None)
        rowCount(name).addAndGet(page.size.toLong)
        val bytes = body.getBytes("UTF-8")
        ex.getResponseHeaders.set("Content-Type", "application/json")
        ex.sendResponseHeaders(200, bytes.length.toLong)
        ex.getResponseBody.write(bytes)
      } catch {
        case e: Exception =>
          val msg = s"""{"error": "${e.getMessage}"}""".getBytes("UTF-8")
          ex.sendResponseHeaders(500, msg.length.toLong)
          ex.getResponseBody.write(msg)
      } finally ex.close()

    private def params(ex: HttpExchange): Map[String, String] = {
      val raw = Option(ex.getRequestURI.getRawQuery).getOrElse("")
      raw.split("&").filter(_.contains("=")).map { kv =>
        val i = kv.indexOf('=')
        java.net.URLDecoder.decode(kv.substring(0, i), "UTF-8") ->
          java.net.URLDecoder.decode(kv.substring(i + 1), "UTF-8")
      }.toMap
    }

    private def render(schema: StructType, page: Seq[Row],
        sel: Option[Seq[String]], next: Option[String]): String = {
      val fields = sel match {
        case Some(names) => names.filter(schema.fieldNames.contains)
        case None => schema.fieldNames.toSeq
      }
      val root = mapper.createObjectNode()
      val arr = root.putArray("value")
      page.foreach { r =>
        val o = arr.addObject()
        fields.foreach { f =>
          r.getAs[Any](f) match {
            case null => o.putNull(f)
            case v: Long => o.put(f, v): Unit
            case v: Int => o.put(f, v): Unit
            case v: Double => o.put(f, v): Unit
            case v: Boolean => o.put(f, v): Unit
            case v: String => o.put(f, v): Unit
            case v => o.put(f, v.toString): Unit
          }
        }
      }
      next.foreach(u => root.put("@odata.nextLink", u))
      mapper.writeValueAsString(root)
    }
  }
}

/** Minimal evaluator for the `$filter` dialect [[ODataFilters]] emits:
  * fully-parenthesized `and`/`or` over `ident op literal` atoms.
  * An unparseable filter yields None — the fixture then serves the
  * table UNFILTERED, which is correct-but-unpruned (the reader keeps
  * every filter as a residual), exactly a real service ignoring
  * `$filter`. */
private[sources] object FixtureFilter {

  type Pred = (StructType, Row) => Boolean

  def parse(s: String): Option[Pred] =
    try {
      val p = new P(s)
      val e = p.expr()
      p.skipWs()
      if (p.done) Some(e) else None
    } catch { case _: Exception => None }

  private sealed trait Lit
  private case object LNull extends Lit
  private final case class LNum(v: BigDecimal) extends Lit
  private final case class LStr(v: String) extends Lit
  private final case class LBool(v: Boolean) extends Lit

  private final class P(s: String) {
    private var i = 0
    def done: Boolean = i >= s.length
    def skipWs(): Unit = while (i < s.length && s(i) == ' ') i += 1

    def expr(): Pred = {
      var acc = term()
      var more = true
      while (more) {
        skipWs()
        if (word("and")) { val r = term(); val l = acc
          acc = (sc, row) => l(sc, row) && r(sc, row) }
        else if (word("or")) { val r = term(); val l = acc
          acc = (sc, row) => l(sc, row) || r(sc, row) }
        else more = false
      }
      acc
    }

    private def term(): Pred = {
      skipWs()
      if (i < s.length && s(i) == '(') {
        i += 1
        val e = expr()
        skipWs()
        require(i < s.length && s(i) == ')', "expected )")
        i += 1
        e
      } else atom()
    }

    private def atom(): Pred = {
      val id = ident()
      skipWs()
      val op = ident()
      skipWs()
      val l = lit()
      (sc, row) => {
        val idx = sc.fieldIndex(id)
        val v = if (row.isNullAt(idx)) null else row.get(idx)
        compare(v, op, l)
      }
    }

    private def word(w: String): Boolean = {
      skipWs()
      if (s.startsWith(w, i) && (i + w.length >= s.length ||
          !s(i + w.length).isLetterOrDigit)) { i += w.length; true }
      else false
    }

    private def ident(): String = {
      skipWs()
      val st = i
      while (i < s.length && (s(i).isLetterOrDigit || s(i) == '_')) i += 1
      require(i > st, s"expected identifier at $st in '$s'")
      s.substring(st, i)
    }

    private def lit(): Lit = {
      skipWs()
      if (word("null")) LNull
      else if (word("true")) LBool(true)
      else if (word("false")) LBool(false)
      else if (i < s.length && s(i) == '\'') {
        i += 1
        val sb = new StringBuilder
        var closed = false
        while (!closed) {
          require(i < s.length, "unterminated string literal")
          if (s(i) == '\'') {
            if (i + 1 < s.length && s(i + 1) == '\'') { sb += '\''; i += 2 }
            else { i += 1; closed = true }
          } else { sb += s(i); i += 1 }
        }
        LStr(sb.toString)
      } else {
        val st = i
        while (i < s.length && (s(i).isDigit || "+-.eE".contains(s(i))))
          i += 1
        require(i > st, s"expected literal at $st in '$s'")
        LNum(BigDecimal(s.substring(st, i)))
      }
    }
  }

  private def compare(v: Any, op: String, l: Lit): Boolean = (op, l) match {
    case ("eq", LNull) => v == null
    case ("ne", LNull) => v != null
    case (_, _) if v == null => false // OData: null compares false
    case (o, LNum(n)) =>
      val d = v match {
        case x: Long => BigDecimal(x)
        case x: Int => BigDecimal(x)
        case x: Double => BigDecimal(x)
        case x: Float => BigDecimal(x.toDouble)
        case x: Short => BigDecimal(x.toInt)
        case x: Byte => BigDecimal(x.toInt)
        case x: java.math.BigDecimal => BigDecimal(x)
        case _ => return false
      }
      cmp(o, d.compare(n))
    case (o, LStr(t)) => v match {
      // UTF-8 BYTE order, not String.compareTo (UTF-16 code units):
      // Spark evaluates the reader's residual copy of the same
      // predicate over UTF8String binary order, and a fixture that
      // prunes server-side with a DIFFERENT order on gt/ge/lt/le would
      // silently under-return rows (the residual can only drop rows,
      // never restore server-omitted ones) for non-BMP text
      case x: String => cmp(o, utf8Cmp(x, t))
      case _ => false
    }
    case (o, LBool(b)) => v match {
      case x: Boolean =>
        cmp(o, java.lang.Boolean.compare(x, b))
      case _ => false
    }
    case _ => false
  }

  /** Unsigned lexicographic compare of the UTF-8 encodings — the
    * ordering Spark's UTF8String.compareTo implements. */
  private def utf8Cmp(a: String, b: String): Int = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    x.length - y.length
  }

  private def cmp(op: String, c: Int): Boolean = op match {
    case "eq" => c == 0
    case "ne" => c != 0
    case "gt" => c > 0
    case "ge" => c >= 0
    case "lt" => c < 0
    case "le" => c <= 0
    case other => throw new IllegalArgumentException(s"op $other")
  }
}
