package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.streaming.StreamOps

/** Streaming operators: tumbling agg through a real streaming query and
  * the flatMapGroupsWithState sessionizer, cross-checked against the
  * batch session_window operator. */
class StreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Sessions.local()
  private val dir = "/root/testdata/sf0.001"

  test("tumbling agg equals the batch equivalent") {
    val streamed = StreamOps.tumblingAgg(spark, dir, "streamspec_tumble")
    val batch = graft.queries.Gate.t(spark, dir, "events")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    assert(streamed.agg(sum("n")).head().getLong(0) ==
      batch.agg(sum("n")).head().getLong(0))
    assert(streamed.count() == batch.count())
  }

  test("stateful sessionizer closes sessions on the gap, matching " +
    "session_window counts for closed sessions") {
    val stateful = StreamOps.sessionizeStateful(spark, dir,
      "streamspec_sess", gapMinutes = 30)
    val batch = StreamOps.sessionAgg(
      graft.queries.Gate.t(spark, dir, "events"), "30 minutes")
    // flatMapGroupsWithState only emits *closed* sessions (the trailing
    // open session per user stays in state) → batch count minus one
    // session per user still open at end-of-data
    val users = batch.select("user_id").distinct().count()
    assert(stateful.count() == batch.count() - users)
    // every closed session matches a batch session exactly
    val b = batch.withColumn("session_start",
      col("session_start").cast("long"))
      .select("user_id", "session_start", "n_events")
    val joined = stateful.select("user_id", "session_start", "n_events")
      .join(b, Seq("user_id", "session_start", "n_events"))
    assert(joined.count() == stateful.count())
  }
}
