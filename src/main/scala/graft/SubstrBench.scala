package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev tool: phase-1 map-stage cost of substring dedup — the rolling
  * window-digest pass ([[graft.functions.WindowDigests]]) vs the
  * replaced O(k)-string build (`xxhash64(array_join(slice(...)))`),
  * at several window sizes over the sf0.1 documents table. Both runs
  * end in the same digest-count aggregate, so the delta is the map
  * stage. Feeds SCALE.md.
  *
  *   sbt "runMain graft.SubstrBench [sfDir] [reps]"
  */
object SubstrBench {

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = Sessions.local()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val toks = filter(graft.operators.Decontaminate.tokens(col("text")),
      w => length(w) > 0)

    def newPhase1(k: Int): DataFrame =
      docs.select(col("doc_id"), posexplode(graft.functions.WindowDigests
          .window_digests(toks, k)).as(Seq("__i", "__h")))
        .groupBy(col("__h")).agg(count(lit(1)).as("c"))
        .filter(col("c") >= 2)

    def oldPhase1(k: Int): DataFrame =
      docs.select(col("doc_id"), toks.as("__tk"))
        .select(col("doc_id"),
          explode(when(size(col("__tk")) >= k,
            sequence(lit(1), size(col("__tk")) - k + 1))
            .otherwise(array().cast("array<int>"))).as("off"),
          col("__tk"))
        .select(xxhash64(array_join(
          slice(col("__tk"), col("off"), lit(k)), " ")).as("__h"))
        .groupBy(col("__h")).agg(count(lit(1)).as("c"))
        .filter(col("c") >= 2)

    val ks = Seq(8, 25, 50)
    // warmup both shapes
    ks.foreach { k => newPhase1(k).count(); oldPhase1(k).count() }
    def med(xs: List[Double]): Double = { val s = xs.sorted; s(s.size / 2) }
    val times = scala.collection.mutable
      .Map[(String, Int), List[Double]]().withDefaultValue(Nil)
    for (_ <- 1 to reps; k <- ks; which <- Seq("old", "new")) {
      val t0 = System.nanoTime()
      (if (which == "new") newPhase1(k) else oldPhase1(k)).count()
      times((which, k)) ::= (System.nanoTime() - t0) / 1e9
    }
    println("| k | string-build phase 1 (s) | rolling-digest phase 1 (s) | speedup |")
    println("|---|---|---|---|")
    ks.foreach { k =>
      val o = med(times(("old", k)))
      val n = med(times(("new", k)))
      println(f"| $k | $o%.2f | $n%.2f | ${o / n}%.1fx |")
    }
    spark.stop()
  }
}
