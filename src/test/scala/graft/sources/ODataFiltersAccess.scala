package graft.sources

import org.apache.spark.sql.sources.Filter

/** Test bridge into the package-private filter translator. */
object ODataFiltersAccess {
  def tr(f: Filter): Option[String] = ODataFilters.translate(f)
}

/** Test bridge into the package-private URL assembly. */
object ODataOptionsAccess {
  def pageUrl(raw: Map[String, String], pushedFilter: Option[String],
      requiredCols: Seq[String]): String =
    ODataOptions(raw).pageUrl(pushedFilter, requiredCols)
}
