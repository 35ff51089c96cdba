package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Packing
import graft.sinks.Sinks

/** Shard writer: pack → writeShards produces one directory per shard,
  * complete and in order, with the file-size cap honored. */
class ShardSinkSpec extends AnyFunSuite {

  lazy val spark = Sessions.local()

  test("packed layout writes one partition dir per shard, losslessly") {
    val docs = queries.Gate.t(spark, "/root/testdata/sf0.001", "documents")
      .withColumn("n_tokens", size(split(col("text"), "\\s+")))
    val packed = Packing.packedLayout(docs, "doc_id", "n_tokens",
      budget = 512, shards = 4)
    val out = java.nio.file.Files
      .createTempDirectory("graftshards").toString
    Sinks.writeShards(packed, out, "shard", "doc_id")
    val dirs = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("shard=")).map(_.getName).sorted
    assert(dirs.length == packed.select("shard").distinct().count())
    val back = spark.read.parquet(out)
    assert(back.count() == packed.count())
    // shard membership survives the round trip
    val a = packed.select("doc_id", "shard").collect()
      .map(r => (r.getLong(0), r.getAs[Number](1).longValue)).toSet
    val b = back.select("doc_id", "shard").collect()
      .map(r => (r.getLong(0), r.getAs[Number](1).longValue)).toSet
    assert(a == b)
  }

  test("maxRecordsPerFile splits a hot shard into multiple files") {
    import spark.implicits._
    val df = (0L until 100L).map(i => (i, 0)).toDF("id", "shard")
    val out = java.nio.file.Files
      .createTempDirectory("graftshards2").toString
    Sinks.writeShards(df, out, "shard", "id", maxRecordsPerFile = 30)
    val files = new java.io.File(s"$out/shard=0").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.length >= 4, s"expected >= 4 files, got ${files.length}")
    assert(spark.read.parquet(out).count() == 100)
  }

  test("shardManifest: per-shard stats over a real placement, and the " +
      "non-dense integrity raise") {
    import spark.implicits._
    val docs = queries.Gate.t(spark, "/root/testdata/sf0.001", "documents")
    val placed = operators.Sampling.epochShards(
      operators.Sampling.shuffleOrder(docs, "doc_id", "m1"),
      "shuffle_pos", 5)
    val m = Sinks.shardManifest(placed, weightCols = Seq("n_chars"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1)
    assert(m.map(_._1).toSeq == (0L until 5L))
    assert(m.map(_._2).sum == docs.count())
    // balanced ±1, every shard dense 1..n
    assert(m.map(_._2).max - m.map(_._2).min <= 1)
    m.foreach { case (_, n, first, last, _) =>
      assert(first == 1L && last == n) }
    // char mass partitions the corpus
    assert(m.map(_._5).sum ==
      docs.agg(sum("n_chars")).collect()(0).getLong(0))
    // a gapped position is a broken placement — raises, names the shard
    val broken = placed.withColumn("pos_in_shard",
      when(col("pos_in_shard") === 2L, 999999L)
        .otherwise(col("pos_in_shard")))
    val e = intercept[Exception] {
      Sinks.shardManifest(broken).collect()
    }
    assert(e.getMessage.contains("non-dense"))
  }
}
