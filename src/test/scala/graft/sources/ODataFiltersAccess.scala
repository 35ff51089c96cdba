package graft.sources

import org.apache.spark.sql.sources.Filter

/** Test bridge into the package-private filter translator. */
object ODataFiltersAccess {
  def tr(f: Filter): Option[String] = ODataFilters.translate(f)
}
