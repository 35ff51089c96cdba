package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Sampling
import graft.sinks.Sinks

/** Epoch-shard placement (Sampling.epochShards) and its materialized
  * artifact: balanced contiguous blocks over the shuffled order, and a
  * writeShards round trip whose per-file row order IS the epoch order —
  * the end-to-end proof that the curation pipeline produces the actual
  * training layout a data loader streams. */
class EpochShardsSpec extends AnyFunSuite {

  lazy val spark = Sessions.local()

  /** Pure-Scala reference: shard of 1-based pos among n rows, S shards. */
  private def refShard(pos: Long, n: Long, s: Long): Long =
    (pos - 1) * s / n
  private def refPosInShard(pos: Long, n: Long, s: Long): Long =
    pos - (refShard(pos, n, s) * n + s - 1) / s

  private def placed(n: Int, s: Int) = {
    import spark.implicits._
    Sampling.epochShards(
      (1L to n.toLong).toDF("shuffle_pos"), "shuffle_pos", s)
      .select("shuffle_pos", "shard", "pos_in_shard")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
  }

  test("placement matches the integer-arithmetic reference at odd n/S") {
    for ((n, s) <- Seq((1, 1), (7, 3), (100, 8), (97, 8), (5, 8), (64, 64))) {
      val got = placed(n, s)
      assert(got.length == n)
      got.foreach { case (p, sh, ps) =>
        assert(sh == refShard(p, n, s), s"shard of pos=$p n=$n S=$s")
        assert(ps == refPosInShard(p, n, s), s"pos_in_shard of pos=$p")
      }
    }
  }

  test("blocks are contiguous, 1-based, exhaustive, balanced within 1") {
    for ((n, s) <- Seq((101, 8), (8, 3), (1000, 7))) {
      val byShard = placed(n, s).groupBy(_._2)
      assert(byShard.keySet.subsetOf((0L until s.toLong).toSet))
      // every row lands somewhere and shard sizes differ by at most one
      val sizes = (0L until s.toLong).map(sh =>
        byShard.get(sh).map(_.length).getOrElse(0))
      assert(sizes.sum == n)
      assert(sizes.max - sizes.min <= 1,
        s"unbalanced shards $sizes at n=$n S=$s")
      byShard.foreach { case (_, rows) =>
        val sorted = rows.sortBy(_._1)
        // pos_in_shard counts 1..size in shuffle_pos order, and the
        // shuffle positions inside a shard form one contiguous run
        assert(sorted.map(_._3).toSeq == (1L to sorted.length.toLong))
        assert(sorted.last._1 - sorted.head._1 + 1 == sorted.length)
      }
    }
  }

  test("a non-dense position column raises in-plan, by name") {
    import spark.implicits._
    val bad = Seq(1L, 2L, 17L).toDF("shuffle_pos") // 17 > n=3
    val e = intercept[Exception] {
      Sampling.epochShards(bad, "shuffle_pos", 2).collect()
    }
    assert(e.getMessage.contains("epochShards"))
    // the message carries the offending value and the bound — at scale
    // a one-in-a-billion bad row must be debuggable from the error alone
    assert(e.getMessage.contains("17"), e.getMessage)
    assert(e.getMessage.contains("[1, 3]"), e.getMessage)
  }

  test("placement is one broadcast-count over a narrow map — no extra " +
    "exchange beyond the count aggregate") {
    import spark.implicits._
    val df = Sampling.epochShards(
      (1L to 1000L).toDF("shuffle_pos"), "shuffle_pos", 8)
    df.collect()
    // the count aggregate's two-stage exchange is the only shuffle; the
    // placement itself must stay a narrow projection (a sort or hash
    // exchange appearing here would mean the layout no longer composes
    // into writeShards' single range exchange)
    assert(PlanChecks.shuffles(df).length <= 1,
      df.queryExecution.executedPlan.toString)
  }

  test("writeShards materializes the placement: files per shard, " +
    "in-file order = epoch order, content lossless") {
    val docs = queries.Gate.t(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "lang", "n_chars")
    val shuffled = Sampling.shuffleOrder(docs, "doc_id", "spec10")
    val plan = Sampling.epochShards(shuffled, "shuffle_pos", 4)
    val out = java.nio.file.Files
      .createTempDirectory("graftepoch").toString
    Sinks.writeShards(plan, out, "shard", "pos_in_shard")

    val expected = plan.select("shard", "pos_in_shard", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expByShard = expected.groupBy(_._1)

    val dirs = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("shard=")).sortBy(_.getName)
    assert(dirs.map(_.getName.stripPrefix("shard=").toLong).toSet ==
      expByShard.keySet)

    val seen = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    dirs.foreach { dir =>
      val sh = dir.getName.stripPrefix("shard=").toLong
      dir.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
        // one file read as one split preserves parquet row order: the
        // rows must come back already sorted by pos_in_shard — the
        // artifact itself is in epoch order, not merely sortable
        val rows = spark.read.parquet(f.getAbsolutePath)
          .select("pos_in_shard", "doc_id")
          .collect().map(r => (r.getLong(0), r.getLong(1)))
        assert(rows.map(_._1).toSeq == rows.map(_._1).sorted.toSeq,
          s"file ${f.getName} of shard $sh not in epoch order")
        rows.foreach { case (ps, id) =>
          seen += ((sh, ps))
          assert(expByShard(sh).exists(e => e._2 == ps && e._3 == id))
        }
      }
    }
    // lossless: every planned (shard, pos) appears exactly once on disk
    val seenSet = seen.toSeq
    assert(seenSet.distinct.length == seenSet.length)
    assert(seenSet.toSet == expected.map(e => (e._1, e._2)).toSet)
  }
}
