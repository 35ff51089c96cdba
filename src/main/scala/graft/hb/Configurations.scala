package graft.hb

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.cache.LineageCache
import Ast._

/** The platform's configuration layer, collapsed into a library
  * (SURVEY §3): a *configuration* binds a transformation chain to a
  * source, where a source is a provider table or the merge/join of other
  * configurations' outputs (tools/workbench/src/Types.fs:58-63,91-104).
  *
  * The reference resolves this graph through RabbitMQ workers with every
  * stage materialized in CouchDB under `source:t1:…:tn` keys
  * (Types.fs:182-202); here the graph is resolved recursively in one
  * Spark session — lazily fused by Catalyst — with the same lineage
  * key scheme backing an optional parquet checkpoint cache, so shared
  * chain prefixes across configurations compute once.
  */
object Configurations {

  sealed trait ConfSource
  /** A provider table (resolved by the caller-supplied table resolver). */
  case class TableSource(name: String) extends ConfSource
  /** Union of other configurations' outputs (S6). */
  case class MergeOf(configs: Seq[String]) extends ConfSource
  /** Outer index join of two configurations' outputs on a field (S7). */
  case class JoinOf(left: String, right: String, field: String)
      extends ConfSource

  case class Conf(source: ConfSource, statements: Seq[Statement])

  /** Build a Conf from `.hb` text (header `provider:`/`table:` ignored —
    * the source is given explicitly). */
  def conf(source: ConfSource, hbText: String): Conf =
    Conf(source, HbParser.parse(hbText).transformations)

  final class Runner(
      spark: SparkSession,
      resolveTable: String => DataFrame,
      cache: Option[LineageCache] = None) {

    private val memo = scala.collection.mutable.Map[String, DataFrame]()

    /** Lineage key of a configuration: source identity + printed
      * statement chain, recursively (Types.fs:182-190 scheme). */
    def lineageKey(configs: Map[String, Conf], name: String): String = {
      val c = configs(name)
      val src = c.source match {
        case TableSource(t) => s"table:$t"
        case MergeOf(cs) =>
          cs.map(lineageKey(configs, _)).mkString("merge(", ",", ")")
        case JoinOf(l, r, f) =>
          s"join(${lineageKey(configs, l)},${lineageKey(configs, r)},$f)"
      }
      (src +: c.statements.map(Printer.print)).mkString(":")
    }

    def run(configs: Map[String, Conf], name: String): DataFrame =
      runRec(configs, name, Set.empty)

    private def runRec(configs: Map[String, Conf], name: String,
        visiting: Set[String]): DataFrame = {
      require(!visiting.contains(name),
        s"configuration cycle through '$name'")
      memo.getOrElseUpdate(name, {
        val c = configs.getOrElse(name,
          throw new NoSuchElementException(s"no configuration '$name'"))
        def compute: DataFrame = {
          val source = c.source match {
            case TableSource(t) => resolveTable(t)
            case MergeOf(cs) =>
              Graft.merge(cs.map(runRec(configs, _, visiting + name)))
            case JoinOf(l, r, f) =>
              Graft.join(runRec(configs, l, visiting + name),
                runRec(configs, r, visiting + name), f)
          }
          Engine.run(
            Program(Header(Map(), Map(), Map()), c.statements), source)
        }
        cache match {
          case Some(lc) =>
            val key = lc.key("conf", Seq(lineageKey(configs, name)))
            lc.getOrCompute(key)(compute)
          case None => compute
        }
      })
    }
  }
}
