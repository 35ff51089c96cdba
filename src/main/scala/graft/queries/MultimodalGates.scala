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
    Gate("m_feature_extract",
      (s, d) => Multimodal.extractFeatures(
        t(s, d, "documents").select(col("doc_id"),
          col("text").cast("binary").as("payload")),
        "payload", dim = 16)
        .select(col("doc_id"), col("features"))
        .orderBy(col("doc_id")),
      None),

    // frame sampling: one row in → many frame rows out, no shuffle.
    Gate("m_frame_sample",
      (s, d) => Multimodal.sampleFrames(
        t(s, d, "documents").select(col("doc_id"),
          col("text").cast("binary").as("payload")),
        "payload", frameBytes = 32, stride = 2)
        .select(col("doc_id"), col("frame_idx"),
          length(col("frame")).as("frame_len"))
        .orderBy(col("doc_id"), col("frame_idx")),
      None)
  )
}
