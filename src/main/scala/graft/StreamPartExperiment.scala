package graft

/** Dev experiment (guide §2): how does streaming state-partition count
  * affect the stateful gates at a fixed master core count?
  *
  *   sbt "runMain graft.StreamPartExperiment [sfDir]"
  */
object StreamPartExperiment {
  def main(a: Array[String]): Unit = {
    val spark = Sessions.local()
    val dir = if (a.length > 0) a(0) else "/root/testdata/sf0.1"
    val gates = Seq("st_stream_join", "st_stream_tumbling",
      "st_stateful_sessions", "st_session_window", "st_dedup_keys")
    for (parts <- Seq(32, 16, 8, 4, 2, 1); n <- gates) {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      spark.sharedState.cacheManager.clearCache()
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(n)(spark, dir).count()
        println(f"[exp] parts=$parts%2d $n ${(System.nanoTime() - t0) / 1e9}%.2f s")
      } catch { case e: Throwable =>
        println(s"[exp] parts=$parts $n FAILED ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
