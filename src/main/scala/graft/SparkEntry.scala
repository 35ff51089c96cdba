package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** The full correctness-gate catalogue (SURVEY §2 inventory + the
    * training-data-pipeline extensions). */
  def gates: Seq[Gate] =
    CoreGates.gates ++ JoinGates.gates ++ WindowGates.gates ++
      TextGates.gates ++ SimilarityGates.gates ++ HbGates.gates ++
      StreamGates.gates ++ MultimodalGates.gates

  /** Flagship: a Velocity.hb-shaped program through the full parser +
    * engine on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("hb_velocity")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    gates.map(g => g.name -> g.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    gates.flatMap(g => g.oracle.map(g.name -> _)).toMap
}
