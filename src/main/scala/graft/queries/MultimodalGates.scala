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

  /** Real-PNG fixture: one deterministic solid-color image per doc —
    * dimensions and color are pure functions of doc_id, so an oracle
    * can state the DECODED properties without being able to parse PNG.
    * Solid color is the key trick for the resize gate: a constant image
    * resamples to exactly its color under any interpolation. Encoding
    * happens executor-side (narrow map), like any real ingest. */
  private def pngFixture(s: org.apache.spark.sql.SparkSession,
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    // layout-decoupled (guide §2.5/§6): the single-row-group documents
    // file otherwise hands the whole PNG encode (and every decode above
    // it) to ONE task — m_feature_extract_real measured 4.4 s in one
    // single-stage job; the fixture is a pure function of doc_id, so a
    // round-robin spread is free of ordering/key concerns
    graft.PlanAudit.repartitionIfLayoutBound(docs.select("doc_id"))
      .as[Long].map { id =>
      // in-memory stream cache (see ImageIOCodec.memoryCache): the
      // encoder side otherwise writes a temp cache file per image
      graft.operators.Multimodal.ImageIOCodec.memoryCache()
      val w = 8 + (id % 32).toInt
      val h = 8 + ((id * 7) % 24).toInt
      val red = (id % 256).toInt
      val rgb = (red << 16) | (((id * 3) % 256).toInt << 8) |
        ((id * 5) % 256).toInt
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var i = 0
      while (i < w * h) { img.setRGB(i % w, i / w, rgb); i += 1 }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      (id, bos.toByteArray)
    }.toDF("doc_id", "payload")
  }

  val gates: Seq[Gate] = Seq(

    // The REAL codec path (operators.Multimodal.ImageIOCodec —
    // javax.imageio, on every JDK): decode genuine PNG bytes and check
    // the decoded header properties against the fixture's generating
    // functions. content_length is excluded (encoded size is
    // encoder-private); everything else is a decoded fact.
    Gate("m_decode_meta_real",
      (s, d) => Multimodal.decodeImageMeta(
        pngFixture(s, t(s, d, "documents")), "payload",
        Multimodal.ImageIOCodec)
        .select("doc_id", "format", "width", "height", "n_channels")
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id, 'png' AS format,
             |  CAST(8 + doc_id % 32 AS INTEGER) AS width,
             |  CAST(8 + (doc_id * 7) % 24 AS INTEGER) AS height,
             |  3 AS n_channels
             |FROM documents ORDER BY doc_id ASC NULLS FIRST""".stripMargin)),

    // Real resample: decode the PNG, Graphics2D-resample to 16×16,
    // emit the red channel — solid-color inputs make every output byte
    // equal the generating red value, so the pixel checksum is exact.
    Gate("m_resize_real",
      (s, d) => Multimodal.resizeImage(
        pngFixture(s, t(s, d, "documents")), "payload", w = 16, h = 16,
        Multimodal.ImageIOCodec)
        .select(col("doc_id"), col("out_w"), col("out_h"),
          length(col("resized")).as("out_len"), col("byte_sum"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id, 16 AS out_w, 16 AS out_h, 256 AS out_len,
             |  CAST(256 * (doc_id % 256) AS BIGINT) AS byte_sum
             |FROM documents ORDER BY doc_id ASC NULLS FIRST""".stripMargin)),

    // REAL-codec feature extraction — the production composition:
    // decode + resample to a 16×16 red-channel thumbnail through
    // javax.imageio, then the folded byte histogram over the DECODED
    // pixels (a color-histogram feature, the classic pre-encoder
    // baseline). Solid-color fixtures decode to 256 identical bytes,
    // so the whole histogram lands in bucket (red % 16) and the oracle
    // states the decoded feature vector exactly.
    Gate("m_feature_extract_real",
      (s, d) => Multimodal.extractFeatures(
        Multimodal.resizeImage(
          pngFixture(s, t(s, d, "documents")), "payload", w = 16, h = 16,
          Multimodal.ImageIOCodec)
          .select(col("doc_id"), col("resized")),
        "resized", dim = 16)
        .select(col("doc_id"),
          length(col("resized")).as("len"),
          posexplode(col("features")))
        .select(col("doc_id"), col("pos").cast("integer").as("dim"),
          round(col("col").cast("double") * col("len"))
            .cast("bigint").as("cnt"))
        .orderBy(col("doc_id"), col("dim")),
      Some("""WITH dims AS (SELECT UNNEST(range(0, 16)) AS dim)
             |SELECT d.doc_id, CAST(m.dim AS INTEGER) AS dim,
             |  CAST(CASE WHEN m.dim = (d.doc_id % 256) % 16
             |    THEN 256 ELSE 0 END AS BIGINT) AS cnt
             |FROM documents d CROSS JOIN dims m
             |ORDER BY doc_id ASC NULLS FIRST, dim ASC NULLS FIRST""".stripMargin)),

    // REAL-codec frame sampling: the decoded 16×16 thumbnail's pixel
    // buffer (256 red-channel bytes) frame-slices into 32-byte chunks,
    // every 2nd kept — 4 frames per doc, each byte the generating red
    // value, so the oracle can state every frame's full hex content.
    Gate("m_frame_sample_real",
      (s, d) => Multimodal.sampleFrames(
        Multimodal.resizeImage(
          pngFixture(s, t(s, d, "documents")), "payload", w = 16, h = 16,
          Multimodal.ImageIOCodec)
          .select(col("doc_id"), col("resized")),
        "resized", frameBytes = 32, stride = 2)
        .select(col("doc_id"), col("frame_idx"),
          length(col("frame")).as("frame_len"),
          lower(hex(col("frame"))).as("frame_hex"))
        .orderBy(col("doc_id"), col("frame_idx")),
      Some("""WITH fr AS (SELECT UNNEST(range(0, 4)) AS i)
             |SELECT d.doc_id, CAST(f.i AS INTEGER) AS frame_idx,
             |  32 AS frame_len,
             |  repeat(lpad(lower(to_hex(d.doc_id % 256)), 2, '0'), 32)
             |    AS frame_hex
             |FROM documents d CROSS JOIN fr f
             |ORDER BY doc_id ASC NULLS FIRST, frame_idx ASC NULLS FIRST""".stripMargin)),

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
             |ORDER BY doc_id ASC NULLS FIRST, frame_idx ASC NULLS FIRST""".stripMargin)),

    // INTERLEAVED vision-language packing (r12) — the multimodal
    // training artifact: each document's token-id stream gets its
    // image's patch tokens (reserved id 999, count from the decoded
    // stub meta: 1 + (width·height) % 4) woven in at a salted-md5
    // position, then the widened streams pack into fixed 256-token
    // sequences (`emitPacked`, doc_starts attention resets) — the
    // LLaVA-style image-token insertion with the stub codec standing in
    // for the patch encoder (payloads never shuffle; only token ids
    // move). FULL oracle: vocab ids, the stub meta arithmetic, the
    // insertion point, and the packing cumsum replayed end to end.
    Gate("m_interleaved_pack", (s, d) => {
      val docs = t(s, d, "documents")
      val meta = Multimodal.decodeImageMeta(
        docs.select(col("doc_id"),
          col("text").cast("binary").as("payload")), "payload")
        .select(col("doc_id"),
          (lit(1L) + (col("width").cast("long") * col("height")) % 4L)
            .cast("int").as("n_img"))
      val enc = graft.operators.Vocab.fitEncode(docs, "doc_id", "text",
        size = 64)
        .select(col("doc_id"), col("token_ids"))
      val widened = enc.join(meta, "doc_id")
        .withColumn("__n", size(col("token_ids")))
        .withColumn("__pos",
          (graft.operators.Sampling.hash32(col("doc_id"), "img") %
            (col("__n").cast("long") + 1L)).cast("int"))
        .withColumn("ids", concat(
          slice(col("token_ids"), lit(1), col("__pos")),
          array_repeat(lit(999), col("n_img")),
          slice(col("token_ids"), col("__pos") + 1,
            col("__n") - col("__pos"))))
        .withColumn("n", size(col("ids")))
      val layout = graft.operators.Packing.packedLayout(widened,
        "doc_id", "n", budget = 256L, shards = 4, salt = "mm12")
      val placed = layout.join(widened.select(col("doc_id"), col("ids")),
        "doc_id")
      graft.operators.Packing.emitPacked(placed, "ids", 256L, padId = 0)
        .select(col("shard"), col("seq"), col("n_docs"), col("n_tokens"),
          array_join(col("input_ids").cast("array<string>"), " ")
            .as("input_ids_str"),
          array_join(col("doc_starts").cast("array<string>"), " ")
            .as("doc_starts_str"))
        .orderBy(col("shard"), col("seq"))
    },
      Some("""WITH tok AS (
        |  SELECT doc_id,
        |    unnest(string_split(lower(regexp_replace(text, '\s+', ' ', 'g')), ' ')) AS tok,
        |    generate_subscripts(string_split(lower(regexp_replace(text, '\s+', ' ', 'g')), ' '), 1) AS pos
        |  FROM documents),
        |cnt AS (SELECT tok, count(*) AS n FROM tok GROUP BY tok),
        |vocab AS (
        |  SELECT tok, ROW_NUMBER() OVER (ORDER BY n DESC, tok ASC) AS id
        |  FROM cnt ORDER BY n DESC, tok ASC LIMIT 64),
        |tids AS (
        |  SELECT t.doc_id,
        |    list(CAST(coalesce(v.id, 0) AS INTEGER) ORDER BY t.pos) AS idl
        |  FROM tok t LEFT JOIN vocab v USING (tok)
        |  GROUP BY t.doc_id),
        |mt AS (
        |  SELECT doc_id,
        |    1 + (CAST(64 + octet_length(CAST(text AS BLOB)) % 1024 AS BIGINT)
        |      * (64 + (octet_length(CAST(text AS BLOB)) * 31) % 768)) % 4
        |      AS n_img
        |  FROM documents),
        |wid AS (
        |  SELECT i.doc_id,
        |    list_concat(list_concat(
        |      i.idl[1:CAST(p.pos0 AS INTEGER)],
        |      list_transform(range(m.n_img), x -> 999)),
        |      i.idl[CAST(p.pos0 + 1 AS INTEGER):len(i.idl)]) AS idl
        |  FROM tids i JOIN mt m USING (doc_id)
        |    JOIN (SELECT doc_id,
        |        CAST('0x' || SUBSTR(md5(CAST(doc_id AS VARCHAR) || ':img'), 1, 8)
        |          AS BIGINT) % (len(idl) + 1) AS pos0
        |      FROM tids) p USING (doc_id)),
        |d0 AS (
        |  SELECT doc_id, idl, CAST(len(idl) AS BIGINT) AS n,
        |    CAST('0x' || SUBSTR(md5(CAST(doc_id AS VARCHAR) || ':mm12'), 1, 8)
        |      AS BIGINT) % 4 AS shard
        |  FROM wid),
        |c AS (
        |  SELECT doc_id, idl, n, shard,
        |    CAST(COALESCE(SUM(n) OVER (PARTITION BY shard ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS bef
        |  FROM d0),
        |parts AS (
        |  SELECT shard, doc_id, idl, n, bef, k AS seq,
        |    greatest(k * 256, bef) AS s,
        |    least((k + 1) * 256, bef + n) AS e
        |  FROM c, unnest(range(bef // 256, (bef + n - 1) // 256 + 1)) AS t(k)),
        |pids AS (
        |  SELECT shard, seq, s, e, bef,
        |    array_to_string(idl[CAST(s - bef + 1 AS INTEGER):CAST(e - bef AS INTEGER)], ' ')
        |      AS portion
        |  FROM parts),
        |seqs AS (
        |  SELECT shard, seq, COUNT(*) AS n_docs,
        |    CAST(SUM(e - s) AS INTEGER) AS n_tokens,
        |    string_agg(portion, ' ' ORDER BY s) AS raw,
        |    COALESCE(string_agg(CASE WHEN s = bef
        |        THEN CAST(s - seq * 256 AS VARCHAR) END,
        |      ' ' ORDER BY s), '') AS doc_starts_str
        |  FROM pids GROUP BY shard, seq)
        |SELECT shard, seq, n_docs, n_tokens,
        |  CASE WHEN n_tokens = 256 THEN raw
        |    ELSE raw || repeat(' 0', 256 - n_tokens) END AS input_ids_str,
        |  doc_starts_str
        |FROM seqs
        |ORDER BY shard ASC NULLS FIRST, seq ASC NULLS FIRST""".stripMargin))
  )
}
