package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One correctness-gate query: a Spark implementation plus (usually) an
  * equivalent ANSI SQL oracle the driver runs in DuckDB over the same
  * parquet tables. `oracle == None` → driver records a rows-only check.
  */
final case class Gate(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Gate {
  /** Load one of the driver-generated tables (TESTDATA.md).
    *
    * `events.ts` is stored as TIMESTAMP(NANOS); with
    * spark.sql.legacy.parquet.nanosAsLong it surfaces as a long that we
    * rescale to a microsecond TimestampType here (`div 1000` floors, the
    * same truncation DuckDB's microsecond TIMESTAMP applies on read — so
    * oracle comparisons stay exact).
    */
  def t(s: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    // ingest-layout self-check (once per path): a big table written as
    // few row groups caps every scan of it — the plan can't see it,
    // only the footers can (PlanAudit; graft.scan.warnBytes/strict)
    graft.PlanAudit.warnIfNarrowLayout(s, path)
    graft.sources.Ingest.normalizeNanos(s.read.parquet(path))
  }
}

/** Deterministic floating-point aggregation helpers.
  *
  * A plain `sum(double)` is accumulation-order dependent, so Spark and a
  * DuckDB oracle can disagree in the last bits and fail a hash compare.
  * Summing after a cast to decimal is EXACT in both engines (any order),
  * and the final decimal→double cast is a single deterministic rounding,
  * so both sides produce bit-identical doubles. Each Spark helper has a
  * matching SQL-text helper used to build the oracle string.
  */
object Det {
  private val dec6 = DecimalType(30, 6)
  private val dec12 = DecimalType(38, 12)

  def dsum(c: Column): Column = sum(c.cast(dec6)).cast(DoubleType)
  def dsumSql(x: String): String =
    s"CAST(SUM(CAST(($x) AS DECIMAL(30,6))) AS DOUBLE)"

  def davg(c: Column): Column =
    (sum(c.cast(dec6)).cast(DoubleType) / count(c))
  def davgSql(x: String): String =
    s"(${dsumSql(x)} / COUNT($x))"

  /** Sample variance from exact decimal sums: (S2 - S1*S1/n)/(n-1). */
  def dvar(c: Column): Column = {
    val s1 = sum(c.cast(dec6)).cast(DoubleType)
    val s2 = sum((c * c).cast(dec12)).cast(DoubleType)
    val n = count(c)
    (s2 - s1 * s1 / n) / (n - lit(1))
  }
  def dvarSql(x: String): String = {
    val s1 = s"CAST(SUM(CAST(($x) AS DECIMAL(30,6))) AS DOUBLE)"
    val s2 = s"CAST(SUM(CAST(($x)*($x) AS DECIMAL(38,12))) AS DOUBLE)"
    s"(($s2 - $s1*$s1/COUNT($x)) / (COUNT($x) - 1))"
  }

  def dstddev(c: Column): Column = sqrt(dvar(c))
  def dstddevSql(x: String): String = s"SQRT(${dvarSql(x)})"

  /** Windowed deterministic sum (same decimal trick over a window frame). */
  def dsumW(c: Column, w: org.apache.spark.sql.expressions.WindowSpec): Column =
    sum(c.cast(dec6)).over(w).cast(DoubleType)
}
