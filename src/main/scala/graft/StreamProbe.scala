package graft

import org.apache.spark.sql.streaming.StreamingQueryListener

/** Dev tool: run streaming gates once with a session-wide
  * StreamingQueryListener and print, per started query, the per-batch
  * durationMs breakdown Structured Streaming already tracks
  * (queryPlanning / walCommit / commitOffsets / getBatch / addBatch /
  * triggerExecution) plus start→first-progress and last-progress→stop
  * latency — the decomposition of the per-gate micro-batch floor the
  * r16 profile attributes to "query start, offset log, checkpoint
  * churn" without naming numbers.
  *
  *   sbt "runMain graft.StreamProbe st_hb_sft,st_stream_join [sfDir]"
  */
object StreamProbe {
  def main(a: Array[String]): Unit = {
    val spark = Sessions.local()
    val names = a(0).split(",").toSeq
    val dir = if (a.length > 1) a(1) else "/root/testdata/sf0.1"
    val events = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val t0 = System.nanoTime()
    def ts: String = f"${(System.nanoTime() - t0) / 1e9}%7.2f"
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit =
        events.add(f"$ts START ${e.name}")
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val d = p.durationMs
        events.add(f"$ts BATCH ${p.name} b=${p.batchId} rows=${p.numInputRows} " +
          s"trigger=${d.get("triggerExecution")} plan=${d.get("queryPlanning")} " +
          s"wal=${d.get("walCommit")} offs=${d.get("commitOffsets")} " +
          s"getB=${d.get("getBatch")} addB=${d.get("addBatch")} " +
          s"latest=${d.get("latestOffset")}")
        val st = p.stateOperators
        if (st.nonEmpty)
          events.add(f"$ts STATE ${p.name} " + st.map(s =>
            s"commit=${s.commitTimeMs}ms rows=${s.numRowsTotal}").mkString(" "))
      }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        events.add(f"$ts STOP")
    })
    for (n <- names) {
      spark.sharedState.cacheManager.clearCache()
      events.add(f"$ts ==== GATE $n ====")
      val w0 = System.nanoTime()
      SparkEntry.queries(n)(spark, dir).count()
      events.add(f"$ts ==== GATE $n wall=${(System.nanoTime() - w0) / 1e9}%.2f")
    }
    Thread.sleep(500) // listener events are async; let the queue drain
    events.forEach(e => println(s"[sprobe] $e"))
    spark.stop()
  }
}
