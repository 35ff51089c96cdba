package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scale-safe global ordering primitives.
  *
  * A plain `row_number().over(Window.orderBy(...))` or `ntile(...)` has no
  * PARTITION BY, so Spark funnels the whole frame through ONE partition
  * (the "No Partition Defined for Window operation" warning). These
  * helpers range-repartition on the order keys instead — partition p's
  * keys all order before partition p+1's — then number rows as
  *
  *   global ordinal = rows in partitions before p + position within p.
  *
  * The per-partition counts come from one small count job over the SAME
  * shuffled RDD (the shuffle files are reused, nothing is recomputed or
  * cached). Sharing one physical partitioning is load-bearing: Spark
  * seeds range-boundary sampling from the RDD id, so two separately
  * planned range exchanges can disagree on boundaries — deriving counts
  * and numbers from two branches silently mis-numbers rows. That forces
  * the one RDD hop in this codebase; everything downstream returns to
  * Dataset land via the original schema + ordinal column.
  */
object Ordinals {

  /** 1-based global row ordinal following `order` (LongType column
    * `name`), with no single-partition stage. Supply a total order
    * (unique tie-break) for deterministic output. */
  def withGlobalOrdinal(df: DataFrame, name: String,
      order: Seq[Column], numPartitions: Int = 0): DataFrame =
    withGlobalOrdinalTotal(df, name, order, numPartitions)._1

  /** As withGlobalOrdinal, but also returns the TOTAL row count — the
    * per-partition count job computes it anyway (eagerly, at call time),
    * so callers that would otherwise run a separate `df.count()` first
    * (KMeansDet's quantile init) save a full pass. */
  def withGlobalOrdinalTotal(df: DataFrame, name: String,
      order: Seq[Column], numPartitions: Int = 0): (DataFrame, Long) =
    zipOrdered(df, order, numPartitions) { (ordinal, _) => ordinal }(
      f => StructField(name, LongType, nullable = false))

  /** NTILE(k) over the global `order` (IntegerType column `name`) without
    * the single-partition window — identical bucket boundaries to SQL
    * NTILE (the first N mod k buckets take the extra row). */
  def withGlobalNtile(df: DataFrame, name: String, k: Int,
      order: Seq[Column], numPartitions: Int = 0): DataFrame =
    zipOrdered(df, order, numPartitions) { (ordinal, total) =>
      val i = ordinal - 1 // 0-based
      val q = total / k
      val r = total % k
      val cut = r * (q + 1)
      val b = if (i < cut) i / (q + 1) else r + (i - cut) / math.max(q, 1L)
      (b + 1).toInt
    }(f => StructField(name, IntegerType, nullable = false))._1

  /** Range-repartition + in-partition sort by `order`, then append
    * `value(globalOrdinal, totalRows)` as a new column. One count job
    * over the shuffled RDD (reused by the main job), one imperative
    * per-partition numbering pass.
    *
    * Both passes stay in InternalRow space (`queryExecution.toRdd` +
    * [[org.apache.spark.sql.GraftSqlBridge]]): the previous
    * `Dataset.rdd` hop deserialized every column to external objects
    * for the count AND the zip, then `createDataFrame` re-encoded them
    * — two full-width conversions whose cost scales with the payload,
    * not the ordinal. The zip appends the computed value with one
    * UnsafeProjection over a JoinedRow, copying untouched fields in
    * their binary form. The projection's output row is REUSED across
    * the iterator (standard operator contract — downstream operators
    * copy when they buffer), never cached here. */
  private def zipOrdered[T](df: DataFrame, order: Seq[Column],
      numPartitions: Int)(value: (Long, Long) => T)(
      field: Unit => StructField): (DataFrame, Long) = {
    val spark = df.sparkSession
    val n = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val sorted = df.repartitionByRange(n, order: _*)
      .sortWithinPartitions(order: _*)
    // ONE physical partitioning for both jobs below (range boundaries
    // are sampled per RDD — two separately planned exchanges could
    // disagree, see class doc)
    val rdd = sorted.queryExecution.toRdd
    val counts = rdd
      .mapPartitionsWithIndex { (i, it) =>
        var c = 0L; while (it.hasNext) { it.next(); c += 1 }
        Iterator.single((i, c))
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _)
    val total = offsets.last
    val schema = StructType(sorted.schema.fields :+ field(()))
    val zipped = rdd.mapPartitionsWithIndex { (i, it) =>
      val proj = org.apache.spark.sql.catalyst.expressions.UnsafeProjection
        .create(schema)
      val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow
      val extra = new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(1)
      var ord = offsets(i)
      it.map { r =>
        ord += 1
        extra.update(0, value(ord, total))
        proj(joined(r, extra)): org.apache.spark.sql.catalyst.InternalRow
      }
    }
    (org.apache.spark.sql.GraftSqlBridge
      .internalCreateDataFrame(spark, zipped, schema), total)
  }
}
