package org.apache.spark.sql

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types.StructType

/** Bridge into the `private[sql]` Column ⇄ Expression converters (Spark 4
  * moved Column onto ColumnNode; `classic.ExpressionUtils` is the blessed
  * in-package way back to Catalyst expressions for custom Expression
  * libraries like graft.functions).
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Build a DataFrame straight from an `RDD[InternalRow]` without the
    * external-Row round trip (`Dataset.rdd` → `Row.fromSeq` →
    * `createDataFrame`'s re-encode).
    *
    * `Dataset.rdd` materializes every column into boxed JVM objects —
    * UTF8String → java.lang.String, array columns → WrappedArray — and
    * `createDataFrame(RDD[Row], schema)` converts it all back. For
    * operators that only APPEND a computed column to otherwise untouched
    * rows (operators.Ordinals' global-ordinal zip), both conversions are
    * pure overhead proportional to the full width of the data; staying in
    * InternalRow space copies fields in their binary representation
    * (UnsafeProjection). `internalCreateDataFrame` wraps the RDD in a
    * plain non-streaming `LogicalRDD`, exactly what `createDataFrame`
    * produces after its conversion — no semantics change, just no
    * conversion. */
  def internalCreateDataFrame(spark: SparkSession, rdd: RDD[InternalRow],
      schema: StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)
}
