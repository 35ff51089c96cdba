package graft

import graft.server.Gateway

/** CLI — run the HTTP gateway as a process, the reference's service
  * deployment mode (`services/gateway` is the long-running host the
  * test harness PUTs configurations to and GETs results from,
  * /root/reference/tests/build.fsx:232-315; here the same routes run
  * over one shared SparkSession so every GET is a fused Catalyst
  * plan).
  *
  * Usage:
  *   runMain graft.Serve [--port N] [--data-dir DIR]
  *     [--master-key KEY] [--max-rows N] [--cache-dir DIR]
  *
  * `--cache-dir` enables the lineage-keyed result cache (the
  * reference's per-stage CouchDB cache, server.Gateway scaladoc):
  * repeat GETs of unchanged configurations serve without Spark jobs,
  * and the parquet store survives restarts.
  *
  * The master key defaults to the GRAFT_MASTER_KEY environment
  * variable (the reference reads its key from the environment too);
  * passing neither refuses to start — an unkeyed admin surface is a
  * misconfiguration, not a default. The server binds loopback only
  * (server.Gateway's contract); fronting it with real transport/auth
  * is the host's job.
  */
object Serve {

  def main(args: Array[String]): Unit = {
    val opts = args.grouped(2).collect { case Array(k, v) => k -> v }.toMap
    val port = opts.get("--port").map(_.toInt).getOrElse(8085)
    val dataDir = opts.getOrElse("--data-dir", ".")
    val maxRows = opts.get("--max-rows").map(_.toInt).getOrElse(100000)
    val key = opts.get("--master-key")
      .orElse(sys.env.get("GRAFT_MASTER_KEY"))
      .getOrElse {
        System.err.println("Serve: no --master-key and no " +
          "GRAFT_MASTER_KEY in the environment — refusing to start " +
          "an unkeyed admin surface")
        sys.exit(2)
        ""
      }
    val spark = Sessions.local()
    val cache = opts.get("--cache-dir")
      .map(dir => new graft.cache.LineageCache(spark, dir))
    val gw = new Gateway(spark, key, dataDir, maxRows = maxRows,
      cache = cache)
    val bound = gw.start(port)
    println(s"graft gateway listening on 127.0.0.1:$bound " +
      s"(data dir: $dataDir)")
    // run until the process is killed; the shutdown hook closes cleanly
    sys.addShutdownHook { gw.stop(); spark.stop() }
    Thread.currentThread.join()
  }
}
