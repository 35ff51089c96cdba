package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Bpe

/** BPE trainer semantics the oracle can't see: the classic worked
  * example, greedy overlap resolution, early stopping, encoding of
  * UNSEEN words, and partitioning invariance of the learned merges. */
class BpeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Sessions.local()
  import spark.implicits._

  test("learns the textbook merge sequence (low/lower/lowest)") {
    // (l,o) and (o,w) tie at 5; left tie-break picks (l,o). Then
    // (lo,w) at 5, then (low,</w>) at 3.
    val df = Seq((1L, "low low low lower lowest")).toDF("doc_id", "text")
    val merges = Bpe.fit(df, "text", 3, minCount = 1L)
      .map(m => (m.left, m.right))
    assert(merges == Seq("l" -> "o", "lo" -> "w", "low" -> Bpe.EndOfWord))
  }

  test("greedy left-to-right: overlapping matches merge at even offsets") {
    val df = Seq((1L, "aaaa aaaa aa")).toDF("doc_id", "text")
    val merges = Bpe.fit(df, "text", 1, minCount = 1L)
    assert(merges.map(m => (m.left, m.right)) == Seq("a" -> "a"))
    val enc = df.select(Bpe.encodeCol(col("text"), merges)).head().getString(0)
    assert(enc == s"aa aa ${Bpe.EndOfWord} aa aa ${Bpe.EndOfWord} aa ${Bpe.EndOfWord}")
  }

  test("stops when the best pair drops below minCount") {
    // every word distinct, every char distinct: all pair counts are 1.
    val df = Seq((1L, "ab cd ef")).toDF("doc_id", "text")
    assert(Bpe.fit(df, "text", 5, minCount = 2L).isEmpty)
    // minCount=1 keeps merging until symbols run out or rounds do.
    assert(Bpe.fit(df, "text", 5, minCount = 1L).nonEmpty)
  }

  test("encodes unseen words by applying the merge table") {
    val train = Seq((1L, "the the the then")).toDF("doc_id", "text")
    val merges = Bpe.fit(train, "text", 2, minCount = 1L)
    // (h,e) beats the (t,h) tie at 4 by the left-asc tie-break, then
    // (t,he): unseen "thee" starts with the learned "the".
    assert(merges.map(m => m.merged) == Seq("he", "the"))
    val enc = Seq((1L, "thee")).toDF("doc_id", "text")
      .select(Bpe.encodeCol(col("text"), merges)).head().getString(0)
    assert(enc == s"the e ${Bpe.EndOfWord}")
  }

  test("learned merges are invariant under repartitioning") {
    val docs = Seq.tabulate(40)(i =>
      (i.toLong, s"spark scan table value part hash row$i")).toDF("doc_id", "text")
    val a = Bpe.fit(docs.coalesce(1), "text", 6, minCount = 1L)
    val b = Bpe.fit(docs.repartition(11), "text", 6, minCount = 1L)
    assert(a == b)
  }

  test("native encodeColFast matches the HOF form char-for-char") {
    val train = Seq.tabulate(30)(i =>
      (i.toLong, "low lower lowest newer wider")).toDF("doc_id", "text")
    val merges = Bpe.fit(train, "text", 8, minCount = 1L)
    val probes = Seq(
      (1L, "low lower lowest"),
      (2L, "  leading   and trailing  "),
      (3L, "MiXeD CaSe LoWeR"),
      (4L, "unseen新词 mixed 中文 tokens"),
      (5L, ""), (6L, "   "),
      (7L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = probes.select(col("doc_id"),
      Bpe.encodeCol(col("text"), merges).as("hof"),
      Bpe.encodeColFast(col("text"), merges).as("fast"))
      .collect()
    out.foreach { r =>
      assert(r.getString(1) == r.getString(2),
        s"doc ${r.getLong(0)}: hof='${r.getString(1)}' " +
          s"fast='${r.getString(2)}'")
    }
  }
}
