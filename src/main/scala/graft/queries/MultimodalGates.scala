package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import Gate.t

/** Multimodal-column gates. The driver tables carry no real media, so the
  * binary payload is the UTF-8 text body — the pipeline shape (binary in,
  * typed metadata / features / frames out) is what's under test; the stub
  * codec is deterministic, so the metadata path is even oracle-checkable.
  */
object MultimodalGates {

  val gates: Seq[Gate] = Seq(

    // decode → typed metadata over mapPartitions; the stub derives
    // metadata from byte length, which DuckDB can replicate exactly.
    Gate("m_decode_meta",
      (s, d) => Multimodal.decodeImageMeta(
        t(s, d, "documents").select(col("doc_id"),
          col("text").cast("binary").as("payload")),
        "payload")
        .select("doc_id", "content_length", "format", "width", "height",
          "n_channels")
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS content_length,
             |  CASE octet_length(CAST(text AS BLOB)) % 3
             |    WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'webp' END AS format,
             |  CAST(64 + octet_length(CAST(text AS BLOB)) % 1024 AS INTEGER) AS width,
             |  CAST(64 + (octet_length(CAST(text AS BLOB)) * 31) % 768 AS INTEGER) AS height,
             |  3 AS n_channels
             |FROM documents ORDER BY doc_id ASC NULLS FIRST""".stripMargin)),

    // feature extraction: fixed-width vectors out of binary payloads
    // (byte-histogram stub); batch-shaped like a vision-encoder pass.
    // Emitted long-form as integer bucket counts (f32 count/len recovered
    // exactly by round(f*len) — |err| « 0.5), so the checker can sort and
    // DuckDB can replicate the histogram byte-by-byte via hex().
    Gate("m_feature_extract",
      (s, d) => Multimodal.extractFeatures(
        t(s, d, "documents").select(col("doc_id"),
          col("text").cast("binary").as("payload")),
        "payload", dim = 16)
        .select(col("doc_id"),
          coalesce(length(col("payload")), lit(0)).as("len"),
          posexplode(col("features")))
        .select(col("doc_id"), col("pos").cast("integer").as("dim"),
          round(col("col").cast("double") * col("len"))
            .cast("bigint").as("cnt"))
        .orderBy(col("doc_id"), col("dim")),
      Some("""WITH h AS (
             |  SELECT doc_id, lower(hex(CAST(text AS BLOB))) AS hx,
             |    octet_length(CAST(text AS BLOB)) AS len
             |  FROM documents),
             |b AS (
             |  SELECT doc_id, hx, UNNEST(range(1, len + 1)) AS i FROM h),
             |v AS (
             |  SELECT doc_id,
             |    strpos('0123456789abcdef', substring(hx, 2*i, 1)) - 1 AS dim
             |  FROM b),
             |hist AS (SELECT doc_id, dim, COUNT(*) AS cnt FROM v GROUP BY 1, 2),
             |dims AS (SELECT UNNEST(range(0, 16)) AS dim)
             |SELECT d.doc_id, CAST(m.dim AS INTEGER) AS dim,
             |  CAST(COALESCE(h.cnt, 0) AS BIGINT) AS cnt
             |FROM documents d CROSS JOIN dims m
             |LEFT JOIN hist h ON h.doc_id = d.doc_id AND h.dim = m.dim
             |ORDER BY d.doc_id ASC NULLS FIRST, dim ASC NULLS FIRST""".stripMargin)),

    // resize: fixed 32×32-byte output budget via stride sampling (stub
    // resampler, real plumbing). The oracle re-derives the sampled byte
    // positions and checksum from the source blob via the hex trick.
    Gate("m_resize",
      (s, d) => Multimodal.resizeImage(
        t(s, d, "documents").select(col("doc_id"),
          col("text").cast("binary").as("payload")),
        "payload", w = 32, h = 32)
        .select(col("doc_id"), col("out_w"), col("out_h"),
          length(col("resized")).as("out_len"), col("byte_sum"))
        .orderBy(col("doc_id")),
      Some("""WITH h AS (
             |  SELECT doc_id, lower(hex(CAST(text AS BLOB))) AS hx,
             |    octet_length(CAST(text AS BLOB)) AS len
             |  FROM documents),
             |p AS (
             |  SELECT doc_id, hx, len, GREATEST(len // 1024, 1) AS stride,
             |    UNNEST(range(0, 1024)) AS i
             |  FROM h),
             |b AS (
             |  SELECT doc_id,
             |    16 * (strpos('0123456789abcdef',
             |            substring(hx, 2*(i*stride) + 1, 1)) - 1)
             |      + strpos('0123456789abcdef',
             |          substring(hx, 2*(i*stride) + 2, 1)) - 1 AS bv
             |  FROM p WHERE i * stride < len),
             |agg AS (
             |  SELECT doc_id, CAST(COUNT(*) AS INTEGER) AS out_len,
             |    CAST(SUM(bv) AS BIGINT) AS byte_sum
             |  FROM b GROUP BY doc_id)
             |SELECT d.doc_id, 32 AS out_w, 32 AS out_h,
             |  COALESCE(agg.out_len, 0) AS out_len,
             |  CAST(COALESCE(agg.byte_sum, 0) AS BIGINT) AS byte_sum
             |FROM documents d LEFT JOIN agg ON agg.doc_id = d.doc_id
             |ORDER BY d.doc_id ASC NULLS FIRST""".stripMargin)),

    // frame sampling: one row in → many frame rows out, no shuffle.
    // Fully deterministic substring arithmetic, so DuckDB can replicate:
    // frames are every 2nd 32-byte chunk; frame_idx counts kept frames.
    Gate("m_frame_sample",
      (s, d) => Multimodal.sampleFrames(
        t(s, d, "documents").select(col("doc_id"),
          col("text").cast("binary").as("payload")),
        "payload", frameBytes = 32, stride = 2)
        .select(col("doc_id"), col("frame_idx"),
          length(col("frame")).as("frame_len"))
        .orderBy(col("doc_id"), col("frame_idx")),
      Some("""WITH f AS (
             |  SELECT doc_id, octet_length(CAST(text AS BLOB)) AS len,
             |    UNNEST(range(0,
             |      GREATEST(octet_length(CAST(text AS BLOB)) // 32 - 1, 0) + 1)) AS i
             |  FROM documents),
             |k AS (SELECT doc_id, i FROM f WHERE i % 2 = 0 AND (i + 1) * 32 <= len)
             |SELECT doc_id,
             |  CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) - 1
             |    AS INTEGER) AS frame_idx,
             |  32 AS frame_len
             |FROM k
             |ORDER BY doc_id ASC NULLS FIRST, frame_idx ASC NULLS FIRST""".stripMargin))
  )
}
