package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `binary` payloads with
  * typed metadata, processed in partition-sized batches.
  *
  * The Spark-side plumbing is real — schema contract, mapPartitions batch
  * shape, partition sizing — and the codec is PLUGGABLE ([[ImageCodec]]):
  * [[StubCodec]] (default) derives deterministic metadata from the
  * payload bytes so every pipeline stays byte-exactly oracle-checkable
  * against synthetic payloads, and [[ImageIOCodec]] is a real JVM decoder
  * (javax.imageio, on every JDK — no container dependency) exercised by
  * the m_decode_meta_real / m_resize_real gates over genuine PNG bytes.
  * Heavier codecs (vision encoders, ffmpeg bindings) implement the same
  * trait; the plumbing and the plan never change.
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

  /** The pluggable codec seam: decode metadata and resample, each
    * returning None for an undecodable payload. Implementations must be
    * Serializable (they ship to executors inside the mapPartitions
    * closures). */
  trait ImageCodec extends Serializable {
    /** (content_length, format, width, height, n_channels). */
    def decode(bytes: Array[Byte]): Option[(Long, String, Int, Int, Int)]
    /** Resample to a w×h budget: (output bytes, unsigned byte sum). */
    def resize(bytes: Array[Byte], w: Int, h: Int): Option[(Array[Byte], Long)]
  }

  /** Deterministic stub — metadata from payload byte arithmetic, resize
    * by stride-sampling payload bytes. Every step is replicable in SQL,
    * which is what lets the m_decode_meta / m_resize gates hash-check
    * the full pipeline over synthetic (non-image) payloads. */
  object StubCodec extends ImageCodec {
    def decode(bytes: Array[Byte]): Option[(Long, String, Int, Int, Int)] = {
      val len = bytes.length.toLong
      val fmt = if (len % 3 == 0) "png" else if (len % 3 == 1) "jpeg" else "webp"
      val width = 64 + (len % 1024).toInt
      val height = 64 + ((len * 31) % 768).toInt
      Some((len, fmt, width, height, 3))
    }
    def resize(bytes: Array[Byte], w: Int, h: Int): Option[(Array[Byte], Long)] = {
      val budget = w * h
      val len = bytes.length
      if (len == 0) return Some((Array.empty[Byte], 0L))
      val stride = math.max(1, len / budget)
      val n = math.min(budget.toLong, (len + stride - 1L) / stride).toInt
      val out = new Array[Byte](n)
      var sum = 0L
      var i = 0
      while (i < n) {
        val b = bytes(i * stride)
        out(i) = b
        sum += (b & 0xFF)
        i += 1
      }
      Some((out, sum))
    }
  }

  /** Real JVM image codec via javax.imageio: header-driven metadata
    * (format name, dimensions, raster bands) and a Graphics2D resample
    * whose output is the RED channel byte per pixel — channel
    * extraction, not a colorspace conversion, so a solid-color fixture
    * resamples to exactly its color under ANY interpolation (what makes
    * m_resize_real oracle-checkable against real pixels). */
  object ImageIOCodec extends ImageCodec {
    /** ImageIO's default stream cache is a TEMP FILE per image stream;
      * with the decode spread over every core (layout decoupling) the
      * tiny-file creates/deletes contend on the temp dir and the
      * parallel path measured SLOWER than the serial one (4.5 s vs
      * 1.5 s at sf0.1). In-memory cache streams are the right shape for
      * byte-array payloads at any parallelism. Executor-side static —
      * set on entry to each codec call so remote executors get it too. */
    private[graft] def memoryCache(): Unit =
      if (javax.imageio.ImageIO.getUseCache)
        javax.imageio.ImageIO.setUseCache(false)
    def decode(bytes: Array[Byte]): Option[(Long, String, Int, Int, Int)] = {
      memoryCache()
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          r.setInput(iis)
          try {
            val img = r.read(0)
            Some((bytes.length.toLong, r.getFormatName.toLowerCase,
              img.getWidth, img.getHeight, img.getRaster.getNumBands))
          } finally r.dispose()
        }
      } finally iis.close()
    }
    def resize(bytes: Array[Byte], w: Int, h: Int): Option[(Array[Byte], Long)] = {
      memoryCache()
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val out = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        try g.drawImage(img, 0, 0, w, h, null) finally g.dispose()
        val res = new Array[Byte](w * h)
        var sum = 0L
        var i = 0
        while (i < w * h) {
          val red = (out.getRGB(i % w, i / w) >> 16) & 0xFF
          res(i) = red.toByte
          sum += red
          i += 1
        }
        Some((res, sum))
      }
    }
  }

  /** Attach decoded metadata columns to `df`, reading binary `binCol`.
    * Batched per partition; output schema = input ++ imageMetaSchema.
    * Null or undecodable payloads yield (0, 'none', 0, 0, 0). */
  def decodeImageMeta(df: DataFrame, binCol: String,
      codec: ImageCodec = StubCodec): DataFrame = {
    val schema = StructType(df.schema.fields ++ imageMetaSchema.fields)
    val binIdx = df.schema.fieldIndex(binCol)
    implicit val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        val (len, fmt, w, h, c) =
          (if (bytes == null) None else codec.decode(bytes))
            .getOrElse((0L, "none", 0, 0, 0))
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

  /** Resample every payload to a `w`×`h` output budget through the
    * codec ([[StubCodec]] stride-samples payload bytes; [[ImageIOCodec]]
    * decodes and resamples real pixels). Narrow map: payloads never
    * shuffle; `byte_sum` is the output-byte checksum the gates verify.
    * Null, empty or undecodable payloads yield an empty output. */
  def resizeImage(df: DataFrame, binCol: String, w: Int, h: Int,
      codec: ImageCodec = StubCodec): DataFrame = {
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
        val (out, sum) =
          (if (bytes == null || bytes.isEmpty) None
           else codec.resize(bytes, w, h))
            .getOrElse((Array.empty[Byte], 0L))
        Row.fromSeq(r.toSeq ++ Seq(w, h, out, sum))
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
      (keyCols.toIndexedSeq.map(col) :+
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
