package graft

/** Dev tool: run EVERY gate in the catalogue with codegen fallback
  * disabled (`spark.sql.codegen.fallback=false`,
  * `factoryMode=CODEGEN_ONLY`), so any custom expression whose
  * doGenCode emits Java that Janino cannot compile FAILS its gate
  * loudly instead of silently running interpreted.
  *
  * Why a main and not only a spec: `CodegenCompileSpec` pins one gate
  * per expression family in the suite (fast, always-on); this probe is
  * the exhaustive sweep — every gate, every expression combination the
  * catalogue actually plans — run once per round to certify the whole
  * surface codegen-clean. The r16 finding it exists to prevent: the
  * LangScore/TrigramBuckets static-forwarder clash failed Janino on
  * every use from r15 until a bench log was finally read, with results
  * bit-identical the whole time (the default fallback hides total
  * codegen failure behind correct answers).
  *
  *   sbt "runMain graft.CodegenProbe [sfDir]"
  */
object CodegenProbe {
  def main(a: Array[String]): Unit = {
    val dir = if (a.nonEmpty) a(0) else "/root/testdata/sf0.001"
    val spark = Sessions.local()
    spark.conf.set("spark.sql.codegen.fallback", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    var bad = List.empty[String]
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      try fn(spark, dir).count()
      catch { case e: Throwable =>
        bad ::= name
        println(s"[codegen-probe] FAIL $name: ${e.getClass.getName}: " +
          String.valueOf(e.getMessage).take(400))
      }
    }
    println(s"[codegen-probe] ${SparkEntry.queries.size - bad.length}/" +
      s"${SparkEntry.queries.size} gates codegen-clean" +
      (if (bad.nonEmpty) s"; FAILED: ${bad.sorted.mkString(",")}" else ""))
    spark.stop()
    if (bad.nonEmpty) sys.exit(1)
  }
}
