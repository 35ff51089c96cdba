package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sinks.Sinks

/** Co-located joins via bucketed tables: both sides bucketed+sorted on
  * the key join with ZERO shuffle exchange — the repeated-big-join
  * strategy SCALE.md prescribes for 100 TB operation. */
class BucketedJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Sessions.local()

  test("equi-join of two same-bucketed tables plans without a shuffle") {
    import spark.implicits._
    // keep table files out of the repo's default warehouse dir
    spark.sql(
      "CREATE DATABASE IF NOT EXISTS bucketdb LOCATION '/tmp/graft-bucketdb'")
    val left = (0L until 2000L).map(i => (i % 500, i, s"l$i"))
      .toDF("k", "id", "payload")
    val right = (0L until 1000L).map(i => (i % 500, s"r$i"))
      .toDF("k", "tag")
    Sinks.writeBucketed(left, "bucketdb.bj_left", Seq("k"), 8)
    Sinks.writeBucketed(right, "bucketdb.bj_right", Seq("k"), 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("bucketdb.bj_left")
        .join(spark.table("bucketdb.bj_right"), "k")
      val n = joined.count()
      assert(n == 2000L * 2) // 4 left rows x 2 right rows per key x 500
      val sh = PlanChecks.shuffles(joined) // AQE-unwrapping check
      assert(sh.isEmpty,
        s"bucketed join must not shuffle, found ${sh.size} exchanges")
      // and it really is a sort-merge join over the bucketed scans
      assert(joined.queryExecution.executedPlan.toString
        .contains("SortMergeJoin"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bucketdb.bj_left")
      spark.sql("DROP TABLE IF EXISTS bucketdb.bj_right")
    }
  }

  test("aggregation on the bucket key reuses the bucketing (no exchange)") {
    import spark.implicits._
    spark.sql(
      "CREATE DATABASE IF NOT EXISTS bucketdb LOCATION '/tmp/graft-bucketdb'")
    val df = (0L until 2000L).map(i => (i % 100, i)).toDF("k", "v")
    Sinks.writeBucketed(df, "bucketdb.bj_agg", Seq("k"), 8)
    try {
      val agg = spark.table("bucketdb.bj_agg")
        .groupBy("k").agg(sum("v").as("s"))
      assert(agg.count() == 100)
      assert(PlanChecks.shuffles(agg).isEmpty,
        "groupBy on the bucket key must reuse the bucketing")
    } finally spark.sql("DROP TABLE IF EXISTS bucketdb.bj_agg")
  }
}
