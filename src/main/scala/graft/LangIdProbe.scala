package graft

import org.apache.spark.sql.functions._

/** Dev tool: phase timing for the trainable-language-ID paths — where
  * do st_hb_langid's seconds go (offline fit, modelMaps collect, batch
  * narrow scoring, streaming run)?
  *
  *   sbt "runMain graft.LangIdProbe [sfDir]"
  */
object LangIdProbe {
  def main(a: Array[String]): Unit = {
    val dir = if (a.nonEmpty) a(0) else "/root/testdata/sf0.1"
    val spark = Sessions.local()
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[lidprobe] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    for (rep <- 1 to 3) {
      spark.sharedState.cacheManager.clearCache()
      val model = t(s"rep$rep fit")(
        graft.operators.LangId.fit(docs, "lang", "text"))
      val maps = t(s"rep$rep modelMaps")(
        graft.operators.LangId.modelMaps(model))
      t(s"rep$rep narrow-batch")(
        graft.operators.LangId.withLangNarrow(docs, maps, "text").count())
      t(s"rep$rep stream")(
        SparkEntry.queries("st_hb_langid")(spark, dir).count())
    }
    spark.stop()
  }
}
