package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.sources.Ingest

/** Multimodal plumbing: schema contract, batch shape, frame explode. The
  * codec is a stub; what must hold is the Spark-side contract. */
class MultimodalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Sessions.local()

  private def payloads = Ingest.localData(spark,
    Seq("id", "body"), Seq(
      Seq(1L, "x" * 100),
      Seq(2L, "y" * 33),
      Seq(3L, "")))
    .select(col("id"), col("body").cast("binary").as("payload"))

  test("decodeImageMeta appends the full metadata contract") {
    val out = Multimodal.decodeImageMeta(payloads, "payload")
    assert(out.columns.toSeq ==
      Seq("id", "payload", "content_length", "format", "width", "height",
        "n_channels"))
    val r = out.filter(col("id") === 1L).head()
    assert(r.getAs[Long]("content_length") == 100L)
    assert(r.getAs[Int]("width") == 64 + 100)
    assert(r.getAs[String]("format") == "jpeg") // 100 % 3 == 1
  }

  test("extractFeatures emits normalized fixed-width vectors") {
    val out = Multimodal.extractFeatures(payloads, "payload", dim = 8)
    val r = out.filter(col("id") === 1L).head()
    val feats = r.getAs[scala.collection.Seq[Float]]("features")
    assert(feats.length == 8)
    assert(math.abs(feats.sum - 1.0f) < 1e-5) // L1-normalized
    val empty = out.filter(col("id") === 3L).head()
    assert(empty.getAs[scala.collection.Seq[Float]]("features").sum == 0f)
  }

  test("sampleFrames explodes stride-sampled fixed-size frames") {
    val out = Multimodal.sampleFrames(payloads, "payload",
      frameBytes = 10, stride = 2)
    // id=1: 100 bytes → frames 0..9, stride 2 → 5 frames
    assert(out.filter(col("id") === 1L).count() == 5)
    assert(out.filter(col("id") === 1L)
      .agg(max(length(col("frame")))).head().getInt(0) == 10)
    // id=3: empty payload → no frames
    assert(out.filter(col("id") === 3L).count() == 0)
  }
}
