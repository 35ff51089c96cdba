package graft

import org.apache.spark.sql.functions._

/** Dev tool: deterministic 10× scale-up of the driver testdata — the
  * sf0.1 → "sf1" corpus for the measured scale pin (SCALE.md). Seeded
  * replication + perturbation, NO randomness:
  *
  *  - documents: `reps` replicas, ids offset by rep·10⁷; every token
  *    of a replica (rep > 0) carries a `_<rep>` suffix, so each
  *    replica keeps the ORIGINAL duplication rate internally and
  *    shares no grams across replicas — "10× more data of the same
  *    kind", not "every gram now repeats 10×" (which would measure a
  *    duplication-mass explosion, not scaling).
  *  - embeddings: replicas rotate the vector by `rep` positions
  *    (norms and pairwise-distance distribution preserved) with ids
  *    offset.
  *  - events: replicas shift `ts` by rep·35 days (time-locality
  *    preserved), ids offset, user/value/props unchanged (10× events
  *    per user — the realistic growth axis).
  *
  *   sbt "runMain graft.ScaleData [srcDir] [outDir] [reps]"
  */
object ScaleData {

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out =
      if (args.length > 1) args(1) else "/root/repo/target/scaledata/sf1"
    val reps = if (args.length > 2) args(2).toInt else 10
    val spark = Sessions.local()
    val repDf = spark.range(reps.toLong).select(col("id").as("__rep"))

    // the driver testdata is ONE parquet FILE per table (streaming
    // gates read with pathGlobFilter=<table>.parquet, which matches
    // leaf FILES — a directory layout silently yields an empty
    // stream); write each table to a temp dir and move the single
    // part file to "<out>/<table>.parquet"
    def writeOne(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = s"$out/__tmp_$name"
      // SMALL row groups (1 MB): parquet splits at row-group
      // granularity, so a single-row-group file is an UNSPLITTABLE
      // scan — at sf1 every narrow stage serialized on one core and
      // the 10× ratios read 3–8.6× instead of the true 1.6–3.0×
      // (measured; SCALE.md). A real cluster's files would carry many
      // row groups; 1 MB gives this corpus 7–24 splits per table.
      df.coalesce(1).write.mode("overwrite")
        .option("parquet.block.size", (1L << 20).toString)
        .parquet(tmp)
      val dir = new java.io.File(tmp)
      val part = dir.listFiles().find(f =>
        f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .getOrElse(throw new IllegalStateException(s"no part file in $tmp"))
      val dst = new java.io.File(s"$out/$name.parquet")
      if (dst.exists()) dst.delete(): Unit
      require(part.renameTo(dst), s"rename ${part.getPath} -> $dst failed")
      dir.listFiles().foreach(_.delete(): Unit)
      dir.delete(): Unit
    }

    val docs = spark.read.parquet(s"$src/documents.parquet")
    val docsN = docs.crossJoin(repDf)
      .select(
        (col("doc_id") + col("__rep") * 10000000L).as("doc_id"),
        when(col("__rep") === 0L, col("text"))
          .otherwise(concat_ws(" ",
            transform(split(col("text"), "\\s+"),
              t => when(length(t) > 0,
                concat(t, lit("_"), col("__rep"))).otherwise(t))))
          .as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .select("doc_id", "text", "lang", "source", "n_chars")
    writeOne(docsN, "documents")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val dim = emb.selectExpr("size(embedding) AS d").head().getInt(0)
    // rotation amount mod dim: reps beyond the vector dimension must
    // wrap (slice(…, dim - rep) with rep > dim is a negative length —
    // runtime error); rep % dim keeps reps < dim bit-identical to the
    // pre-fix corpora (sf1/sf3 regenerate unchanged)
    val rot = (col("__rep") % lit(dim.toLong)).cast("int")
    val embN = emb.crossJoin(repDf)
      .select(
        (col("vec_id") + col("__rep") * 10000000L).as("vec_id"),
        when(rot === 0, col("embedding"))
          .otherwise(concat(
            slice(col("embedding"), rot + 1, lit(dim) - rot),
            slice(col("embedding"), lit(1), rot)))
          .as("embedding"),
        col("label"))
    writeOne(embN, "embeddings")

    val ev = spark.read.parquet(s"$src/events.parquet")
    val evN = ev.crossJoin(repDf)
      .select(
        (col("event_id") + col("__rep") * 100000000L).as("event_id"),
        (col("ts") + col("__rep") * expr("INTERVAL 35 DAYS")).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
    writeOne(evN, "events")

    println(s"== wrote $out: documents=${docsN.count()} " +
      s"embeddings=${embN.count()} events=${evN.count()}")
    spark.stop()
  }
}
