package graft.sinks

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Output formats of the reference platform. */
object Sinks {

  /** S9 — `Format(Json)`: array of `{col: value}` row objects
    * (common/hobbes.messaging/src/Broker.fs:95-102;
    * workers/calculator.worker/src/Processer.fs:40-65).
    * Distributed: returns a Dataset of JSON strings (one per row); use
    * `.write.text(...)` for a file sink at scale. */
  def rowObjectsJson(df: DataFrame): org.apache.spark.sql.Dataset[String] =
    df.toJSON

  /** S10 — the CouchDB matrix cache shape
    * `{"columnNames": [...], "values": [[...]...], "rowCount": N}` with
    * null for missing cells (sample embedded at
    * tools/visualizer/cli/src/Program.fs:49; invariants
    * workers/calculator.worker/src/Program.fs:41-42).
    * Driver-side assembly — the gateway serves whole documents, which
    * bounds this to gateway-sized results (use parquet internally for
    * anything big). */
  def matrixJson(df: DataFrame, maxRows: Int = 1000000): String = {
    val cols = df.columns
    val rows = df.limit(maxRows).collect()
    val sb = new StringBuilder
    sb.append("{\"columnNames\":[")
    sb.append(cols.map(c => "\"" + escape(c) + "\"").mkString(","))
    sb.append("],\"values\":[")
    var first = true
    rows.foreach { r =>
      if (!first) sb.append(',')
      first = false
      sb.append('[')
      sb.append((0 until r.length).map(i => cell(r, i)).mkString(","))
      sb.append(']')
    }
    sb.append("],\"rowCount\":").append(rows.length).append('}')
    sb.toString
  }

  /** Bucketed parquet table write — the co-location primitive for
    * repeated big joins/aggregations at scale: two tables bucketed (and
    * sorted) the same way on the join key equi-join with ZERO shuffle
    * exchange on either side (SortMergeJoin reads the buckets
    * pre-partitioned and pre-sorted). Bucket metadata lives in the
    * catalog, so this writes a TABLE (`saveAsTable`), not a bare path;
    * pick `buckets` ≈ target parallelism for the downstream joins.
    * BucketedJoinSpec asserts the exchange-free plan. */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
      buckets: Int): Unit = {
    require(keys.nonEmpty, "writeBucketed needs at least one bucket key")
    require(buckets > 0, s"bucket count must be positive, got $buckets")
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)
  }

  /** Training-data shard writer: the dataset laid out as `shards`
    * roughly equal parquet files, each internally ordered by `orderCol`
    * — the layout a data loader streams sequentially (shard = worker
    * unit; deterministic shard membership when `orderCol` is salted-
    * hash-assigned upstream, e.g. Packing.packedLayout's `shard`
    * column, so re-runs produce byte-stable shards).
    *
    * 100 TB shape: one range exchange on (shardCol, orderCol) does
    * both the placement and the in-file ordering;
    * `maxRecordsPerFile` caps file size so a hot shard splits instead
    * of producing a multi-GB file. */
  def writeShards(df: DataFrame, path: String, shardCol: String,
      orderCol: String, maxRecordsPerFile: Long = 0): Unit = {
    require(df.columns.contains(shardCol), s"no column '$shardCol'")
    val w = df
      .repartitionByRange(col(shardCol), col(orderCol))
      .sortWithinPartitions(col(shardCol), col(orderCol))
      .write.mode("overwrite")
    (if (maxRecordsPerFile > 0)
      w.option("maxRecordsPerFile", maxRecordsPerFile)
    else w)
      .partitionBy(shardCol)
      .parquet(path)
  }

  /** The per-shard manifest a data loader reads before streaming the
    * [[writeShards]] artifact — and the placement INTEGRITY check: for
    * each shard, the row count, position range and per-`weightCols`
    * mass (`sum_<col>`). A shard whose `posCol` is not dense 1..n
    * RAISES in-plan (a gapped or non-1-based shard means the
    * placement upstream is broken — shipping its manifest would let a
    * loader seek to positions that don't exist). One aggregate over
    * (shard → stats); the manifest is ≤numShards rows, broadcast- and
    * driver-safe by construction. */
  def shardManifest(placed: DataFrame, shardCol: String = "shard",
      posCol: String = "pos_in_shard",
      weightCols: Seq[String] = Nil): DataFrame = {
    require(placed.columns.contains(shardCol), s"no column '$shardCol'")
    require(placed.columns.contains(posCol), s"no column '$posCol'")
    val aggs = Seq(
      count(lit(1)).as("n_rows"),
      min(col(posCol)).cast("long").as("first_pos"),
      max(col(posCol)).cast("long").as("last_pos"),
      countDistinct(col(posCol)).as("__npos")) ++
      weightCols.map(w => sum(col(w)).cast("long").as(s"sum_$w"))
    placed.groupBy(col(shardCol)).agg(aggs.head, aggs.tail: _*)
      // dense ⇔ first = 1 ∧ span = count ∧ no duplicate positions
      .withColumn("n_rows",
        when(col("first_pos") =!= 1L ||
          col("last_pos") - col("first_pos") + 1L =!= col("n_rows") ||
          col("__npos") =!= col("n_rows"),
          raise_error(concat(lit("shardManifest: shard "),
            col(shardCol).cast("string"),
            lit(s" has a non-dense $posCol (first="),
            col("first_pos").cast("string"),
            lit(", last="), col("last_pos").cast("string"),
            lit(", rows="), col("n_rows").cast("string"),
            lit(", distinct="), col("__npos").cast("string"),
            lit(") — placement is broken"))))
          .otherwise(col("n_rows")))
      .drop("__npos")
  }

  private def cell(r: Row, i: Int): String =
    if (r.isNullAt(i)) "null"
    else r.get(i) match {
      // JSON has no NaN/Infinity literal; the reference's encoder throws on
      // anything it can't encode (Processer.fs:44-53) — we render null so a
      // sink document always parses.
      case d: java.lang.Double if d.isNaN || d.isInfinite => "null"
      case f: java.lang.Float if f.isNaN || f.isInfinite => "null"
      case n: java.lang.Number => n.toString
      case b: Boolean => b.toString
      case other => "\"" + escape(other.toString) + "\""
    }

  private def escape(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }
}
