package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `binary` payloads with
  * typed metadata, processed in partition-sized batches.
  *
  * The Spark-side plumbing is real — schema contract, mapPartitions batch
  * shape, partition sizing — while the codec itself is a deterministic
  * stub: the image/audio libraries are not in this container, so
  * `decodeStub` derives metadata from the payload bytes. Swapping in a real
  * decoder changes only the function body, not the plumbing or the plan.
  *
  * Scale design: decode is a narrow map — no shuffle, no driver data.
  * Payloads stay in the executor; only fixed-width metadata (and
  * fixed-size feature vectors) come out, so the output is orders of
  * magnitude smaller than the input scan. `maxPartitionBytes` governs
  * batch size; there is no per-row JVM boundary crossing.
  */
object Multimodal {

  /** Metadata contract for a decoded image payload. */
  val imageMetaSchema: StructType = StructType(Seq(
    StructField("content_length", LongType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_channels", IntegerType, nullable = false)))

  /** STUB decoder — deterministic fake: metadata derived from payload
    * bytes. A real implementation would parse the image header here. */
  private def decodeStub(bytes: Array[Byte]): (Long, String, Int, Int, Int) = {
    val len = bytes.length.toLong
    val fmt = if (len % 3 == 0) "png" else if (len % 3 == 1) "jpeg" else "webp"
    val width = 64 + (len % 1024).toInt
    val height = 64 + ((len * 31) % 768).toInt
    (len, fmt, width, height, 3)
  }

  /** Attach decoded metadata columns to `df`, reading binary `binCol`.
    * Batched per partition; output schema = input ++ imageMetaSchema. */
  def decodeImageMeta(df: DataFrame, binCol: String): DataFrame = {
    val schema = StructType(df.schema.fields ++ imageMetaSchema.fields)
    val binIdx = df.schema.fieldIndex(binCol)
    implicit val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        val (len, fmt, w, h, c) =
          if (bytes == null) (0L, "none", 0, 0, 0) else decodeStub(bytes)
        Row.fromSeq(r.toSeq ++ Seq(len, fmt, w, h, c))
      }
    }
  }

  /** STUB feature extractor: fixed-width feature vector from the payload
    * (a real version would run a vision encoder per batch). Deterministic:
    * byte histogram folded to `dim` buckets, L1-normalized. */
  def extractFeatures(df: DataFrame, binCol: String, dim: Int = 16): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField("features", ArrayType(FloatType, containsNull = false)))
    val binIdx = df.schema.fieldIndex(binCol)
    implicit val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        val hist = new Array[Float](dim)
        if (bytes != null && bytes.nonEmpty) {
          var i = 0
          while (i < bytes.length) {
            hist((bytes(i) & 0xFF) % dim) += 1f
            i += 1
          }
          var j = 0
          while (j < dim) { hist(j) /= bytes.length.toFloat; j += 1 }
        }
        Row.fromSeq(r.toSeq :+ hist.toSeq)
      }
    }
  }

  /** STUB resize: a real implementation decodes and resamples pixels; the
    * stub keeps the full contract — a fixed `w*h`-byte output budget per
    * image — by stride-sampling the payload bytes (deterministic, so the
    * oracle replicates the byte selection and checksum). Swapping in a
    * real resampler changes only this body. Narrow map: payloads never
    * shuffle; `byte_sum` is the sampled-byte checksum the gate verifies. */
  def resizeImage(df: DataFrame, binCol: String, w: Int, h: Int): DataFrame = {
    val budget = w * h
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("out_w", IntegerType, nullable = false),
      StructField("out_h", IntegerType, nullable = false),
      StructField("resized", BinaryType, nullable = true),
      StructField("byte_sum", LongType, nullable = false)))
    val binIdx = df.schema.fieldIndex(binCol)
    implicit val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        if (bytes == null || bytes.isEmpty)
          Row.fromSeq(r.toSeq ++ Seq(w, h, Array.empty[Byte], 0L))
        else {
          val len = bytes.length
          val stride = math.max(1, len / budget)
          val n = math.min(budget.toLong,
            (len + stride - 1L) / stride).toInt
          val out = new Array[Byte](n)
          var sum = 0L
          var i = 0
          while (i < n) {
            val b = bytes(i * stride)
            out(i) = b
            sum += (b & 0xFF)
            i += 1
          }
          Row.fromSeq(r.toSeq ++ Seq(w, h, out, sum))
        }
      }
    }
  }

  /** Frame sampling for a (stub) video payload: emit every `stride`-th
    * chunk of `frameBytes` as a frame row — the explode-shaped op of a
    * video pipeline, one row in → many rows out, no shuffle. */
  def sampleFrames(df: DataFrame, binCol: String, frameBytes: Int,
      stride: Int): DataFrame = {
    val keyCols = df.schema.fields.map(_.name).filterNot(_ == binCol)
    df.select(
      (keyCols.map(col) :+
        posexplode(sliceBinary(col(binCol), frameBytes, stride))): _*)
      .withColumnRenamed("pos", "frame_idx")
      .withColumnRenamed("col", "frame")
  }

  /** Split a binary column into frame-sized slices (every stride-th). */
  private def sliceBinary(c: org.apache.spark.sql.Column, frameBytes: Int,
      stride: Int): org.apache.spark.sql.Column = {
    val nFrames = floor(length(c).cast(LongType) / lit(frameBytes.toLong))
      .cast(LongType)
    transform(
      filter(sequence(lit(0L), greatest(nFrames - 1, lit(0L))),
        i => i % stride === 0 && (i + 1) * frameBytes <= length(c)),
      i => substr(c, (i * frameBytes + 1).cast(IntegerType),
        lit(frameBytes)))
  }
}
