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

  test("resizeImage keeps the w*h byte budget and checksums the sample") {
    val out = Multimodal.resizeImage(payloads, "payload", w = 4, h = 4)
    assert(out.columns.takeRight(4).toSeq ==
      Seq("out_w", "out_h", "resized", "byte_sum"))
    // id=1: 100 bytes into a 16-byte budget → stride 6, 16 bytes kept
    val r1 = out.filter(col("id") === 1L).head()
    val resized1 = r1.getAs[Array[Byte]]("resized")
    assert(resized1.length == 16)
    assert(resized1.forall(_ == 'x'.toByte))
    assert(r1.getAs[Long]("byte_sum") == 16L * 'x'.toInt)
    // id=2: 33 bytes, stride 2 → ceil(33/2) = 17 > budget → 16 kept
    assert(out.filter(col("id") === 2L).head()
      .getAs[Array[Byte]]("resized").length == 16)
    // id=3: empty payload → empty resize, zero checksum
    val r3 = out.filter(col("id") === 3L).head()
    assert(r3.getAs[Array[Byte]]("resized").isEmpty)
    assert(r3.getAs[Long]("byte_sum") == 0L)
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
