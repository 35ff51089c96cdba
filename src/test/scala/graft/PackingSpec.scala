package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.operators.Packing

/** Sequence-packing layout semantics: boundary straddling, per-shard
  * contiguity, zero-token docs, and the bad-input guard. */
class PackingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Sessions.local()

  test("docs straddle sequence boundaries exactly (single shard)") {
    import spark.implicits._
    val df = Seq((1L, 3000L), (2L, 2000L), (3L, 4096L), (4L, 1L))
      .toDF("id", "t")
    val out = Packing.packedLayout(df, "id", "t", budget = 4096L,
      shards = 1)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (1L, 0L, 0L, 0L),    // [0, 3000)
      (2L, 0L, 1L, 3000L), // [3000, 5000) spans seqs 0-1
      (3L, 1L, 2L, 904L),  // [5000, 9096) spans seqs 1-2
      (4L, 2L, 2L, 904L))) // [9096, 9097)
  }

  test("per-shard layout is contiguous and reconstructible") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val df = (0L until 500L).map(i => (i, 1L + rnd.nextInt(2000).toLong))
      .toDF("id", "t")
    val rows = Packing.packedLayout(df, "id", "t", budget = 1024L,
      shards = 4)
      .join(df, "id")
      .select("id", "shard", "seq_first", "seq_offset", "t")
      .collect()
      .map(r => (r.getLong(1), r.getLong(0), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    rows.groupBy(_._1).foreach { case (_, docs) =>
      var before = 0L
      docs.sortBy(_._2).foreach { case (_, _, seqFirst, offset, t) =>
        assert(seqFirst == before / 1024L)
        assert(offset == before % 1024L)
        before += t
      }
    }
  }

  test("determinism: identical layout across recomputation") {
    import spark.implicits._
    val df = (0L until 200L).map(i => (i, (i % 37) * 13 + 1)).toDF("id", "t")
    def layout() = Packing.packedLayout(df, "id", "t", 512L, shards = 4)
      .collect().map(_.toSeq).toSet
    assert(layout() == layout())
  }

  test("null or negative token counts raise") {
    val df = sources.Ingest.localData(spark, Seq("id", "t"),
      Seq(Seq(1L, 5L), Seq(2L, null)))
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    val e = intercept[Exception] {
      Packing.packedLayout(df, "id", "t", 128L, shards = 1).collect()
    }
    assert(causes(e).exists(c =>
      String.valueOf(c.getMessage).contains("bad token count")))
    intercept[IllegalArgumentException] {
      Packing.packedLayout(df, "id", "t", 0L)
    }
  }
}
