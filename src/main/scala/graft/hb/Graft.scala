package graft.hb

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Public API — the gateway/calculator surface collapsed into a library
  * (SURVEY §3.4). A hobbes *configuration* = source + transformation chain
  * + optional merge/join of other configurations' outputs; here those are
  * plain DataFrames in, DataFrame out.
  */
object Graft {

  /** Parse and run a `.hb` program against a source table. */
  def runHb(text: String, source: DataFrame): DataFrame =
    Engine.runHb(text, source)

  def run(program: Ast.Program, source: DataFrame): DataFrame =
    Engine.run(program, source)

  def parse(text: String): Ast.Program = HbParser.parse(text)

  /** `Merge {Datasets}` — union-all by column name, tolerating missing
    * columns on either side; row count is the sum of operands including
    * empty ones (common/hobbes.messaging/src/Broker.fs:81-85;
    * workers/calculator.worker/tests/Processer.fs:63-74). */
  def merge(frames: Seq[DataFrame]): DataFrame =
    frames.reduce(_.unionByName(_, allowMissingColumns = true))

  /** `Join {Left; Right; Field}` — index both sides by `field`, then an
    * outer index join (Deedle's default frame join;
    * workers/calculator.worker/src/Processer.fs:24-33, `right |>
    * left.Join field`; "joins are always done on the index",
    * snippets:60-67). On column-name collision the left side wins —
    * production merge/join configs always join disjoint column sets
    * (tools/workbench/src/Configurations/MergeJoinTest.fs:7-8).
    * AQE / broadcast selection is Spark's: an equi-join on `field`. */
  def join(left: DataFrame, right: DataFrame, field: String): DataFrame = {
    val collisions = right.columns.toSet
      .intersect(left.columns.toSet) - field
    val r = collisions.foldLeft(right)((df, c) => df.drop(c))
    left.join(r, Seq(field), "full_outer")
  }
}
