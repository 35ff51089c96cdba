package graft.queries

import org.apache.spark.sql.functions._
import graft.hb.Graft
import Gate.t

/** Gates that execute real `.hb` programs through the parser + engine —
  * the DSL end-to-end against the DuckDB oracle. Programs are shaped after
  * the reference corpus (Velocity.hb / MTTR.hb / LogicCycleTime.hb),
  * retargeted at the driver's `events`/`part` tables.
  *
  * Aggregated values are integer counts (exact in any summation order), so
  * plain window AVG stays bit-identical across engines.
  */
object HbGates {

  // Velocity.hb:21-32 shape: filter → pivot(count) → sort → moving mean.
  private val velocityHb =
    """create column day (format date "ts" date)
      |pivot [day] [event_type] -> count [event_id]
      |sort by column day
      |create column click3 (moving mean 3 [click])
      |create column view7 (moving mean 7 [view])
      |slice columns day click view purchase click3 view7
      |""".stripMargin

  // MTTR.hb:20-36 shape: tick → group sum → keys → sort → expanding +
  // moving → strip missing prefix.
  private val mttrHb =
    """create column tick 1
      |slice columns user_id tick
      |group by user_id -> sum
      |create column user_id keys
      |sort by column user_id
      |create column running (expanding sum [tick])
      |create column m5 (moving mean 5 [tick])
      |only !(m5 = missing)
      |""".stripMargin

  // LogicCycleTime/logic.hb shape: contains → maxby → if/else → slice.
  private val latestHb =
    """only (contains event_type ['click'; 'view'; 'purchase'])
      |group by user_id event_type -> maxby event_id
      |create column day (format date "ts" date)
      |create column kind (if [event_type = 'purchase'] {'buy'} else {'other'})
      |slice columns user_id event_type event_id day kind
      |""".stripMargin

  // MTTR.hb:30 / Metrics.fs:67 shape: `index rows by` re-keys the frame,
  // `keys` reifies the index, grouping and sorting follow the key
  // discipline. Integer tick sums keep the oracle exact.
  private val indexByHb =
    """index rows by (format date "ts" date)
      |create column day keys
      |create column tick 1
      |slice columns day tick
      |group by day -> sum
      |create column day keys
      |sort by column day
      |""".stripMargin

  // snippets:101-108 shape: row-wise `each sum` across the numeric cells
  // through the text surface. The engine's fold is left-to-right over the
  // column list, so DuckDB replicates it with the same expression; the
  // output is the single reduction column (the hidden ingest key never
  // surfaces), ordered by value — ties are identical rows.
  private val eachHb =
    """create column half (value / 2)
      |slice columns value half
      |each sum
      |""".stripMargin

  // snippets:109-116 shape with a DOUBLE column: the engine's grouped
  // mean goes through exact decimal accumulation (Engine.reduceDet), so
  // even floating .hb aggregates hash-match the DuckDB oracle.
  /** Text signals inside a `.hb` program — langid prediction + quality
    * filter. Shared (program AND oracle) by the batch gate
    * `hb_langid_signal` and its streaming twin `st_hb_quality`: every
    * statement is a narrow map, so the identical program runs
    * incrementally. */
  private[queries] val langidSignalHb: String =
    """create column lp (langid (text))
      |create column hit (if [lp = lang] {1} else {0})
      |only (quality (text) > 0.3)
      |slice columns doc_id lang lp hit
      |""".stripMargin

  private[queries] lazy val langidSignalOracleSql: String =
    """WITH sig AS (
      |  SELECT doc_id, lang,
      |    len(regexp_extract_all(lower(text), '\b(the|and|of|to|in|is)\b')) AS en,
      |    len(regexp_extract_all(lower(text), '\b(der|die|das|und|ist|nicht)\b')) AS de,
      |    len(regexp_extract_all(lower(text), '\b(le|la|les|et|est|une)\b')) AS fr,
      |    len(regexp_extract_all(lower(text), '\b(el|los|las|y|es|una)\b')) AS es,
      |    len(regexp_extract_all(text, '\S+')) AS nt0,
      |    len(regexp_extract_all(text, '[.,;:!?]')) AS np,
      |    len(regexp_extract_all(lower(text), '\b(the|a|an|and|or|of|to|in|is|it)\b')) AS ns
      |  FROM documents),
      |lp AS (
      |  SELECT doc_id, lang,
      |    CASE WHEN en >= de AND en >= fr AND en >= es THEN 'en'
      |         ELSE CASE WHEN de >= fr AND de >= es THEN 'de'
      |              ELSE CASE WHEN fr >= es THEN 'fr' ELSE 'es' END END END AS lp,
      |    LEAST(nt0 * 1.0 / 100.0, 1.0)
      |      * (1.0 - LEAST(np * 1.0 / (nt0 + 1), 1.0))
      |      * (0.5 + LEAST(ns * 1.0 / (nt0 + 1), 0.5)) AS q
      |  FROM sig)
      |SELECT doc_id, lang, lp,
      |  CAST(CASE WHEN lp = lang THEN 1 ELSE 0 END AS BIGINT) AS hit
      |FROM lp WHERE q > 0.3
      |ORDER BY doc_id ASC NULLS FIRST""".stripMargin

  private val groupMeanHb =
    """create column day (format date "ts" date)
      |slice columns day value
      |group by day -> mean
      |create column day keys
      |sort by column day
      |""".stripMargin

  // snippets:85-92 shape: equal-count buckets through the text surface —
  // locks the Engine → operators.Ordinals range-partitioned NTILE path
  // against DuckDB's NTILE. Integer sums keep the oracle exact.
  private val bucketsHb =
    """create column tick 1
      |slice columns event_id tick
      |sort by column event_id
      |buckets (8) -> (sum)
      |create column bucket keys
      |sort by column bucket
      |""".stripMargin

  // The keyed-execution opt-in (`series:` header): moving/expanding
  // windows partition by the per-entity column — the 100 TB form of the
  // reference's per-entity series programs (Metrics.fs:56-61) with zero
  // whole-frame WindowExec in the plan. Integer inputs keep window AVG
  // exact in both engines.
  private val seriesHb =
    """series: user_id
      |
      |sort by column event_id
      |sort by column ts
      |create column m3 (moving mean 3 [event_id])
      |create column run (expanding sum [event_id])
      |slice columns user_id event_id m3 run
      |""".stripMargin

  // snippets:198-205 `linear regression` through the text surface — now
  // an aggregate+broadcast plan (no whole-frame window). y is constructed
  // exactly linear in x, so slope/intercept and every prediction are
  // bit-exact in both engines (integer sums < 2^53, division exact).
  private val linregHb =
    """create column y (p_partkey * 2 + 3)
      |create column pred (linear regression [p_partkey] [y])
      |slice columns p_partkey y pred
      |""".stripMargin

  // Velocity.hb pivot with the explicit value list — schema declared up
  // front, no distinct-discovery job (the high-cardinality-colE path).
  private val pivotValuesHb =
    """create column day (format date "ts" date)
      |pivot [day] [event_type] -> count [event_id] ['click'; 'view'; 'purchase']
      |sort by column day
      |slice columns day click view purchase
      |""".stripMargin

  // E10/E11: bare + double-quoted identifiers (space!), numeric/string
  // literals, and `only True` (1_General.fs:65-67) end-to-end.
  private val identHb =
    """create column "Size Plus" (p_size + 1)
      |only True
      |slice columns p_partkey "Size Plus"
      |""".stripMargin

  private val identSql =
    """SELECT p_partkey, CAST(p_size + 1 AS BIGINT) AS "Size Plus"
      |FROM part
      |ORDER BY p_partkey ASC NULLS FIRST""".stripMargin

  // snippets:206-213 `linear extrapolation` through the text surface —
  // the statement the reference ships disabled ("there's a bug making
  // the calculator crash", Metrics.fs:69-81). `index rows by` first
  // pins the frame key to p_partkey so the fit's x-axis is
  // deterministic. y is exactly linear in the key and the train tail's
  // mean key lands on an exactly-representable x.5, so every fit step
  // (slope 3.0, means, predictions) is exact IEEE arithmetic — the
  // appended forecasts hash-match the closed form 3(max+i)+7.
  private val extrapHb =
    """index rows by p_partkey
      |create column y (p_partkey * 3 + 7)
      |create column fc (linear extrapolation [y] 5 50)
      |slice columns y fc
      |""".stripMargin

  // Statement-interaction pipeline: keyed windows (series opt-in) →
  // missing-prefix strip → date derivation → group-by (which consumes
  // the series column and ends keyed mode) → key reification → sort.
  // Guards the series lifecycle ACROSS statements, not just per-feature.
  // user_id (the series column) SURVIVES the slice into the group-by so
  // the gate really exercises GroupBy's series deactivation: user_id is
  // numeric and not a group key, so it is REDUCED to a per-day sum under
  // its own name and must drop out of the active series.
  private val seriesPipelineHb =
    """series: user_id
      |
      |sort by column event_id
      |sort by column ts
      |create column m2 (moving sum 2 [event_id])
      |only !(m2 = missing)
      |create column day (format date "ts" date)
      |slice columns user_id day m2
      |group by day -> sum
      |create column day keys
      |sort by column day
      |""".stripMargin

  // ---- training-pipeline extension statements through the text surface.
  // Each compiles to the operator the library gates already prove
  // (Dedup/Sampling/Packing/Similarity) and shares that gate's FULL
  // oracle — these pin the parser → engine wiring end-to-end. Programs
  // `index rows by <id>` first (the reference's key discipline): the
  // extension statements key survival/placement on the frame index.

  private val dedupExactHb =
    """index rows by doc_id
      |dedup exact text
      |slice columns doc_id n_chars
      |""".stripMargin

  private val dedupMinhashHb =
    """index rows by doc_id
      |dedup minhash text 0.5
      |slice columns doc_id
      |""".stripMargin

  private val dedupSimhashHb =
    """index rows by doc_id
      |dedup simhash text 3
      |slice columns doc_id
      |""".stripMargin

  // The d_minhash_cc twin: transitive near-dup clustering as a
  // statement — `component` = min key of the row's verified-pair
  // cluster.
  private val clusterMinhashHb =
    """index rows by doc_id
      |cluster minhash text 0.5
      |slice columns doc_id component
      |""".stripMargin

  // The t_pipeline_e2e twin: dedup → salted split → keep train → pack,
  // entirely as DSL text. `split` takes the s1 salt so the two surfaces
  // share one oracle; `pack` runs on the doc_id index with the library
  // gate's budget/shard geometry.
  private val dedupPipelineHb =
    """index rows by doc_id
      |dedup exact text
      |split 80/10/10 by doc_id 's1'
      |only (split = 'train')
      |pack n_chars 4096 8
      |create column doc_id keys
      |slice columns doc_id shard seq_first seq_last seq_offset
      |""".stripMargin

  // The t_mix_sample twin: stratified domain mixing as DSL text — same
  // per-stratum percentages and salt, ids = the doc_id index.
  private val mixHb =
    """index rows by doc_id
      |mix by lang [en 100; de 50; fr 25] 10 'mix1'
      |create column doc_id keys
      |slice columns doc_id lang
      |""".stripMargin

  // Deterministic 80% hash sample as DSL text (`sample` statement) —
  // the train threshold of the s1 split, so the kept set equals the
  // split gate's train rows by construction (monotone bucket).
  private val sampleHb =
    """sample 80 by doc_id 's1'
      |slice columns doc_id
      |""".stripMargin

  // The t_chunk twin: fixed-window chunking as DSL text — same geometry
  // (64-token windows, stride 48) keyed on the doc_id index, the id
  // re-materialized from keys.
  private val chunkHb =
    """index rows by doc_id
      |chunk text 64 48
      |create column doc_id keys
      |slice columns doc_id chunk_id tok_start n_chunk_tokens chunk_md5
      |""".stripMargin

  // The s_ann_topk twin: exact cosine top-10 for the first five vectors
  // against the whole corpus, ids = the vec_id index, query set chosen
  // by a predicate over `keys`.
  private val neighborsHb =
    """index rows by vec_id
      |neighbors 10 [embedding] [keys < 5]
      |""".stripMargin

  // Velocity.hb:24 shape: regex group extraction + int cast + arithmetic.
  private val regexHb =
    """create column brand_num (int (regex [p_brand] /Brand#(\d+)/ [$1]))
      |create column half (p_retailprice / 2)
      |only (p_size > 20)
      |slice columns p_partkey brand_num half
      |""".stripMargin

  /** Shared by hb_decontaminate_cfg and its streaming-ingest twin
    * st_hb_decon (`decon text using eval 4` over the same 25-doc eval
    * slice): per-doc 4-gram overlap flag against the eval grams. */
  /** The hb_pretrain_e2e oracle — the whole pretraining-mix chain from
    * first principles in one WITH: 4-gram decon flags, quantized-cosine
    * semantic flags (the SimilarityGates arithmetic), the C4 signals,
    * eval-quoted 8-window coverage + reconstruction, fingerprint dedup,
    * salted mix buckets, then the byte-BPE rounds + GPT-2 id mapping
    * over the KEPT set (TextGates.bpeBytesChainSql parameterized off
    * `documents`), and the packing cumsum/emit (the hbSftPipeline
    * machinery at budget 256 / 4 shards). MATERIALIZED hints on every
    * CTE the heavy chains re-reference. */
  private[queries] lazy val pretrainE2eOracleSql: String = {
    val q = SimilarityGates.qSql("embedding")
    val dq = SimilarityGates.dotQSql
    """WITH dtk AS MATERIALIZED (
      |  SELECT doc_id, source, text,
      |    string_split(lower(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS tk
      |  FROM documents),
      |dgr AS (
      |  SELECT doc_id,
      |    unnest(list_transform(range(1, greatest(len(tk) - 3, 0) + 1),
      |      i -> array_to_string(tk[i:i+3], ' '))) AS gram
      |  FROM dtk),
      |egr AS (SELECT DISTINCT gram FROM dgr WHERE doc_id < 25),
      |nghit AS MATERIALIZED (
      |  SELECT DISTINCT g.doc_id
      |  FROM dgr g JOIN egr USING (gram) WHERE g.doc_id >= 25),
      |""".stripMargin +
      s"""e0 AS (SELECT vec_id, $q AS qv FROM embeddings),
      |e1 AS (SELECT vec_id, qv, SQRT(${dq("qv", "qv")}) AS nrm FROM e0),
      |sev AS (SELECT qv, nrm FROM e1 WHERE vec_id < 25),
      |smx AS MATERIALIZED (
      |  SELECT t.vec_id,
      |    MAX(CASE WHEN t.nrm > 0 AND v.nrm > 0
      |      THEN CAST(FLOOR(${dq("t.qv", "v.qv")} / (t.nrm * v.nrm) * 1e9) AS BIGINT)
      |      ELSE -1000000000 END) AS mc
      |  FROM e1 t CROSS JOIN sev v WHERE t.vec_id >= 25
      |  GROUP BY t.vec_id),
      |""".stripMargin +
      """filt AS MATERIALIZED (
      |  SELECT d.doc_id, d.source, d.tk
      |  FROM dtk d
      |    JOIN smx ON smx.vec_id = d.doc_id
      |    LEFT JOIN nghit h USING (doc_id)
      |  WHERE d.doc_id >= 25
      |    AND h.doc_id IS NULL
      |    AND NOT (smx.mc >= 250000000)
      |    AND len(regexp_extract_all(d.text, '\S+')) >= 20
      |    AND CAST(len(d.tk) - len(list_distinct(d.tk)) AS DOUBLE) / len(d.tk) <= 0.55),
      |swf AS MATERIALIZED (
      |  SELECT doc_id, i, md5(array_to_string(tk[i:i+7], ' ')) AS fp
      |  FROM filt, unnest(range(1, greatest(len(tk) - 7, 0) + 1)) AS t(i)),
      |sev8 AS (
      |  SELECT DISTINCT md5(array_to_string(tk[i:i+7], ' ')) AS fp
      |  FROM dtk, unnest(range(1, greatest(len(tk) - 7, 0) + 1)) AS t(i)
      |  WHERE doc_id < 25),
      |scov AS (
      |  SELECT DISTINCT w.doc_id, w.i + j.j AS pos
      |  FROM swf w JOIN sev8 USING (fp), unnest(range(0, 8)) AS j(j)),
      |scva AS (SELECT doc_id, list(pos) AS cv FROM scov GROUP BY doc_id),
      |scl AS MATERIALIZED (
      |  SELECT f.doc_id, f.source,
      |    COALESCE(array_to_string(list_transform(
      |      list_filter(range(1, len(f.tk) + 1),
      |        p -> c.cv IS NULL OR NOT list_contains(c.cv, p)),
      |      p -> f.tk[p]), ' '), '') AS scrubbed
      |  FROM filt f LEFT JOIN scva c USING (doc_id)),
      |win AS (
      |  SELECT MIN(doc_id) AS doc_id FROM scl
      |  GROUP BY md5(lower(regexp_replace(scrubbed, '\s+', ' ', 'g')))),
      |kept AS MATERIALIZED (
      |  SELECT s.doc_id, s.scrubbed
      |  FROM scl s JOIN win USING (doc_id)
      |  WHERE CAST('0x' || SUBSTR(md5(CAST(s.doc_id AS VARCHAR) || ':pmx'), 1, 8)
      |      AS BIGINT) % 10000
      |    < (CASE s.source WHEN 'src2' THEN 10000
      |        WHEN 'src3' THEN 8000 ELSE 6000 END)
      |    AND len(regexp_extract_all(s.scrubbed, '\S+')) > 0),
      |""".stripMargin +
      TextGates.bpeBytesChainSql("scrubbed", 6, from = "kept", lead = "") +
      """,
      |base AS (
      |  SELECT b AS id,
      |    CASE WHEN b = 32 THEN 'Ġ' WHEN b = 10 THEN 'Ċ'
      |      WHEN b = 9 THEN 'ĉ' ELSE chr(CAST(b AS INTEGER)) END AS sym
      |  FROM range(256) AS t(b)
      |  WHERE (b BETWEEN 33 AND 126) OR b IN (32, 10, 9)),
      |mg AS (""".stripMargin +
      (1 to 6).map(k =>
        s"SELECT 255 + $k AS id, l || r AS sym FROM b$k")
        .mkString("\n", "\nUNION ALL\n", "),\n") +
      """vocab AS (
      |  SELECT sym, MIN(id) AS id
      |  FROM (SELECT id, sym FROM base UNION ALL SELECT id, sym FROM mg)
      |  GROUP BY sym),
      |docids AS MATERIALIZED (
      |  SELECT d.doc_id, list(v.id ORDER BY d.tpos, w.pos) AS idl,
      |    CAST(COUNT(*) AS BIGINT) AS n
      |  FROM dtok d JOIN st6 w USING (word) JOIN vocab v USING (sym)
      |  GROUP BY d.doc_id),
      |d0 AS (
      |  SELECT doc_id, idl, n,
      |    CAST('0x' || SUBSTR(md5(CAST(doc_id AS VARCHAR) || ':pack'), 1, 8)
      |      AS BIGINT) % 4 AS shard
      |  FROM docids),
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
      |      ' ' ORDER BY s), '') AS doc_starts
      |  FROM pids GROUP BY shard, seq)
      |SELECT shard, seq, n_docs, n_tokens,
      |  CASE WHEN n_tokens = 256 THEN raw
      |    ELSE raw || repeat(' 0', 256 - n_tokens) END AS input_ids,
      |  doc_starts
      |FROM seqs
      |ORDER BY shard ASC NULLS FIRST, seq ASC NULLS FIRST""".stripMargin
  }

  private[queries] lazy val deconCfgOracleSql: String =
    """WITH tok AS (
      |  SELECT doc_id,
      |    string_split(lower(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS tk
      |  FROM documents),
      |grams AS (
      |  SELECT doc_id,
      |    unnest(list_transform(range(1, greatest(len(tk) - 3, 0) + 1),
      |      i -> array_to_string(tk[i:i+3], ' '))) AS gram
      |  FROM tok),
      |eg AS (SELECT DISTINCT gram FROM grams WHERE doc_id < 25),
      |hits AS (
      |  SELECT DISTINCT g.doc_id
      |  FROM grams g JOIN eg USING (gram) WHERE g.doc_id >= 25)
      |SELECT d.doc_id, (h.doc_id IS NOT NULL) AS contaminated
      |FROM documents d LEFT JOIN hits h USING (doc_id)
      |WHERE d.doc_id >= 25
      |ORDER BY d.doc_id ASC NULLS FIRST""".stripMargin

  val gates: Seq[Gate] = Seq(

    Gate("hb_velocity",
      (s, d) => Graft.runHb(velocityHb, t(s, d, "events")).orderBy(col("day")),
      Some("""WITH p AS (
             |  SELECT CAST(ts AS DATE) AS day,
             |    NULLIF(COUNT(CASE WHEN event_type = 'click' THEN 1 END), 0) AS click,
             |    NULLIF(COUNT(CASE WHEN event_type = 'view' THEN 1 END), 0) AS view,
             |    NULLIF(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END), 0) AS purchase
             |  FROM events GROUP BY 1)
             |SELECT day, click, view, purchase,
             |  CASE WHEN ROW_NUMBER() OVER w >= 3 THEN
             |    AVG(click) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) END AS click3,
             |  CASE WHEN ROW_NUMBER() OVER w >= 7 THEN
             |    AVG(view) OVER (w ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) END AS view7
             |FROM p WINDOW w AS (ORDER BY day)
             |ORDER BY day ASC NULLS FIRST""".stripMargin)),

    Gate("hb_mttr",
      (s, d) => Graft.runHb(mttrHb, t(s, d, "events"))
        .orderBy(col("user_id")),
      Some("""WITH g AS (
             |  SELECT user_id, COUNT(*) AS tick FROM events GROUP BY user_id)
             |SELECT * FROM (
             |  SELECT tick, user_id,
             |    CAST(SUM(tick) OVER (ORDER BY user_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running,
             |    CASE WHEN ROW_NUMBER() OVER (ORDER BY user_id) >= 5 THEN
             |      AVG(tick) OVER (ORDER BY user_id
             |        ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) END AS m5
             |  FROM g)
             |WHERE m5 IS NOT NULL
             |ORDER BY user_id ASC NULLS FIRST""".stripMargin)),

    Gate("hb_latest_by",
      (s, d) => Graft.runHb(latestHb, t(s, d, "events"))
        .orderBy(col("user_id"), col("event_type")),
      Some("""SELECT user_id, event_type, event_id, CAST(ts AS DATE) AS day,
             |  CASE WHEN event_type = 'purchase' THEN 'buy' ELSE 'other' END AS kind
             |FROM (
             |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
             |    ORDER BY event_id DESC) AS rn
             |  FROM events
             |  WHERE event_type IN ('click', 'view', 'purchase'))
             |WHERE rn = 1
             |ORDER BY user_id ASC NULLS FIRST, event_type ASC NULLS FIRST""".stripMargin)),

    Gate("p8_index_rows_by",
      (s, d) => Graft.runHb(indexByHb, t(s, d, "events"))
        .orderBy(col("day")),
      Some("""SELECT CAST(COUNT(*) AS BIGINT) AS tick, CAST(ts AS DATE) AS day
             |FROM events GROUP BY CAST(ts AS DATE)
             |ORDER BY day ASC NULLS FIRST""".stripMargin)),

    Gate("hb_each_sum",
      (s, d) => Graft.runHb(eachHb, t(s, d, "events"))
        .orderBy(col("sum")),
      Some("""SELECT (0.0 + value) + value / 2 AS sum
             |FROM events ORDER BY sum ASC NULLS FIRST""".stripMargin)),

    Gate("hb_group_mean",
      (s, d) => Graft.runHb(groupMeanHb, t(s, d, "events"))
        .orderBy(col("day")),
      Some("""SELECT CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE)
             |    / COUNT(value) AS value,
             |  CAST(ts AS DATE) AS day
             |FROM events GROUP BY CAST(ts AS DATE)
             |ORDER BY day ASC NULLS FIRST""".stripMargin)),

    Gate("hb_buckets",
      (s, d) => Graft.runHb(bucketsHb, t(s, d, "events"))
        .orderBy(col("bucket")),
      Some("""WITH b AS (
             |  SELECT event_id, 1 AS tick,
             |    CAST(NTILE(8) OVER (ORDER BY event_id) AS INTEGER) AS bucket
             |  FROM events)
             |SELECT CAST(SUM(event_id) AS BIGINT) AS event_id,
             |  CAST(SUM(tick) AS BIGINT) AS tick, bucket
             |FROM b GROUP BY bucket
             |ORDER BY bucket ASC NULLS FIRST""".stripMargin)),

    Gate("hb_regex_int",
      (s, d) => Graft.runHb(regexHb, t(s, d, "part"))
        .orderBy(col("p_partkey")),
      Some("""SELECT p_partkey,
             |  CAST(regexp_extract(p_brand, 'Brand#(\d+)', 1) AS INTEGER) AS brand_num,
             |  p_retailprice / 2 AS half
             |FROM part WHERE p_size > 20
             |ORDER BY p_partkey ASC NULLS FIRST""".stripMargin)),

    Gate("hb_series_window",
      (s, d) => Graft.runHb(seriesHb, t(s, d, "events"))
        .orderBy(col("event_id")),
      Some("""SELECT user_id, event_id,
             |  CASE WHEN ROW_NUMBER() OVER w >= 3 THEN
             |    AVG(event_id) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) END AS m3,
             |  CAST(SUM(event_id) OVER
             |    (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run
             |FROM events
             |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
             |ORDER BY event_id ASC NULLS FIRST""".stripMargin)),

    Gate("hb_linreg",
      (s, d) => Graft.runHb(linregHb, t(s, d, "part"))
        .orderBy(col("p_partkey")),
      // oracle mirrors the engine's fit exactly: decimal sums → double,
      // slope = (n·sxy − sx·sy)/(n·sxx − sx·sx), pred = (my − slope·mx)
      // + slope·x. y = 2x+3 makes the slope exactly 2.0, so every
      // arithmetic step is FMA-immune and bit-identical.
      Some("""WITH f AS (
             |  SELECT COUNT(*) AS n,
             |    CAST(SUM(CAST(CAST(p_partkey AS DOUBLE) AS DECIMAL(30,6))) AS DOUBLE) AS sx,
             |    CAST(SUM(CAST(CAST(p_partkey*2+3 AS DOUBLE) AS DECIMAL(30,6))) AS DOUBLE) AS sy,
             |    CAST(SUM(CAST(CAST(p_partkey AS DOUBLE) * CAST(p_partkey*2+3 AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE) AS sxy,
             |    CAST(SUM(CAST(CAST(p_partkey AS DOUBLE) * CAST(p_partkey AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE) AS sxx
             |  FROM part)
             |SELECT p_partkey, CAST(p_partkey*2+3 AS BIGINT) AS y,
             |  (sy/n - ((n*sxy - sx*sy)/(n*sxx - sx*sx)) * (sx/n))
             |    + ((n*sxy - sx*sy)/(n*sxx - sx*sx)) * CAST(p_partkey AS DOUBLE) AS pred
             |FROM part, f
             |ORDER BY p_partkey ASC NULLS FIRST""".stripMargin)),

    Gate("hb_pivot_values",
      (s, d) => Graft.runHb(pivotValuesHb, t(s, d, "events"))
        .orderBy(col("day")),
      Some("""SELECT CAST(ts AS DATE) AS day,
             |  NULLIF(COUNT(CASE WHEN event_type = 'click' THEN 1 END), 0) AS click,
             |  NULLIF(COUNT(CASE WHEN event_type = 'view' THEN 1 END), 0) AS view,
             |  NULLIF(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END), 0) AS purchase
             |FROM events GROUP BY 1
             |ORDER BY day ASC NULLS FIRST""".stripMargin)),

    Gate("e10_identifiers",
      (s, d) => Graft.runHb(identHb, t(s, d, "part"))
        .orderBy(col("p_partkey")),
      Some(identSql)),

    // E11 + the Scala combinator surface: the identHb twin built through
    // hb.Dsl (parse-at-construction round-trip) must hash to the same
    // oracle as its `.hb` source form.
    Gate("e11_dsl_surface",
      (sparkSess, d) => {
        import graft.hb.Dsl._
        transformation(
          create("Size Plus", c("p_size") + n(1)),
          only(True),
          slice("p_partkey", "Size Plus"))
          .run(t(sparkSess, d, "part"))
          .orderBy(col("p_partkey"))
      },
      Some(identSql)),

    // E12 (extension): the `%` arithmetic operator at `*`/`/`
    // precedence — what scale-proportional slicing needs in a DSL-only
    // program (`only (id % 100 = 7)`); landed with the mined-pairs
    // flagship. Strict `int()` keeps the cell type integral so the
    // oracle's BIGINT modulo compares exactly.
    Gate("e12_modulo",
      (s, d) => Graft.runHb(
        """index rows by p_partkey
          |create column bucket (int ((p_partkey * 7 + 3) % 10))
          |only (bucket % 3 = 1)
          |slice columns p_partkey bucket
          |""".stripMargin, t(s, d, "part"))
        .orderBy(col("p_partkey")),
      Some("""SELECT p_partkey,
             |  CAST((p_partkey * 7 + 3) % 10 AS INTEGER) AS bucket
             |FROM part
             |WHERE CAST((p_partkey * 7 + 3) % 10 AS INTEGER) % 3 = 1
             |ORDER BY p_partkey ASC NULLS FIRST""".stripMargin)),

    Gate("hb_series_pipeline",
      (s, d) => Graft.runHb(seriesPipelineHb, t(s, d, "events"))
        .orderBy(col("day")),
      Some("""WITH w AS (
             |  SELECT user_id, CAST(ts AS DATE) AS day,
             |    CASE WHEN ROW_NUMBER() OVER win >= 2 THEN
             |      SUM(event_id) OVER
             |        (win ROWS BETWEEN 1 PRECEDING AND CURRENT ROW)
             |    END AS m2
             |  FROM events
             |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id))
             |SELECT CAST(SUM(user_id) AS BIGINT) AS user_id,
             |  CAST(SUM(m2) AS BIGINT) AS m2, day
             |FROM w WHERE m2 IS NOT NULL GROUP BY day
             |ORDER BY day ASC NULLS FIRST""".stripMargin)),

    Gate("hb_dedup_exact",
      (s, d) => Graft.runHb(dedupExactHb, t(s, d, "documents"))
        .orderBy(col("doc_id")),
      Some(s"""WITH win AS (
             |  SELECT MIN(doc_id) AS doc_id FROM documents
             |  GROUP BY md5(lower(${TextGates.normSql})))
             |SELECT d.doc_id, d.n_chars
             |FROM documents d JOIN win USING (doc_id)
             |ORDER BY doc_id ASC NULLS FIRST""".stripMargin)),

    Gate("hb_dedup_minhash",
      (s, d) => Graft.runHb(dedupMinhashHb, t(s, d, "documents"))
        .orderBy(col("doc_id")),
      Some(SimilarityGates.minhashLshOracleSql)),

    Gate("hb_dedup_simhash",
      (s, d) => Graft.runHb(dedupSimhashHb, t(s, d, "documents"))
        .orderBy(col("doc_id")),
      Some(SimilarityGates.simhashOracleSql)),

    Gate("hb_cluster_minhash",
      (s, d) => Graft.runHb(clusterMinhashHb, t(s, d, "documents"))
        .orderBy(col("doc_id")),
      Some(SimilarityGates.minhashCcOracleSql)),

    Gate("hb_dedup_pipeline",
      (s, d) => Graft.runHb(dedupPipelineHb, t(s, d, "documents"))
        .orderBy(col("doc_id")),
      Some(TextGates.pipelineOracleSql)),

    // The t_passage_scrub twin through the text surface: `scrub text`
    // on the doc_id index compiles to the same PassageDedup.scrub call;
    // the full scrubbed string itself is hash-compared (not just a
    // digest), so the reconstruction is pinned character-for-character.
    Gate("hb_scrub",
      (s, d) => Graft.runHb(
        """index rows by doc_id
          |scrub text
          |slice columns doc_id n_tokens n_removed scrubbed
          |""".stripMargin, t(s, d, "documents"))
        .orderBy(col("doc_id")),
      Some("WITH " + TextGates.scrubCtesSql + "\n" +
        """SELECT doc_id, n_tokens,
          |  CAST(n_tokens - len(kept) AS BIGINT) AS n_removed,
          |  COALESCE(array_to_string(kept, ' '), '') AS scrubbed
          |FROM cl ORDER BY doc_id ASC NULLS FIRST""".stripMargin)),

    Gate("hb_mix",
      (s, d) => Graft.runHb(mixHb, t(s, d, "documents"))
        .orderBy(col("doc_id")),
      Some(TextGates.mixOracleSql)),

    // NFKC-lite normalization through the expression surface (r12 —
    // `normalize (e)`): the frame carries the Scala-built junk fixture
    // (the .hb text surface cannot spell invisible codepoints) and the
    // statement chain normalizes it — shares t_normalize's oracle
    // arithmetic.
    Gate("hb_normalize", (s, d) => {
      val junk = concat(
        lit("\u00A0\u201CBegin\u2026\u201D \u200Bx\u0007y\u2014 "),
        expr("substring(text, 1, 40)"),
        lit(" \u2018q\u2019  end\u00AD."))
      Graft.runHb(
        """index rows by doc_id
          |create column norm (normalize (raw))
          |create column doc_id keys
          |slice columns doc_id norm
          |""".stripMargin,
        t(s, d, "documents").withColumn("raw", junk))
        .orderBy(col("doc_id"))
    },
      Some(s"""SELECT doc_id, ${TextGates.normalizeJunkSql} AS norm
           |FROM documents
           |ORDER BY doc_id ASC NULLS FIRST""".stripMargin)),

    // Temperature-2 mix through the statement surface (r12 — `mix
    // temperature by`): the t_temperature_mix twin on the frame index.
    Gate("hb_mix_temperature",
      (s, d) => Graft.runHb(
        """index rows by doc_id
          |mix temperature by lang 'tm1'
          |create column doc_id keys
          |slice columns doc_id lang
          |""".stripMargin, t(s, d, "documents"))
        .orderBy(col("doc_id")),
      Some(TextGates.temperatureMixOracleSql)),

    Gate("hb_sample",
      (s, d) => Graft.runHb(sampleHb, t(s, d, "documents"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id FROM (
             |  SELECT doc_id,
             |    CAST('0x' || SUBSTR(md5(CAST(doc_id AS VARCHAR) || ':s1'), 1, 8)
             |      AS BIGINT) % 10000 AS b
             |  FROM documents)
             |WHERE b < 8000
             |ORDER BY doc_id ASC NULLS FIRST""".stripMargin)),

    Gate("hb_chunk",
      (s, d) => Graft.runHb(chunkHb, t(s, d, "documents"))
        .orderBy(col("doc_id"), col("chunk_id")),
      Some(TextGates.chunkOracleSql)),

    // Leakage-safe split, pure `.hb`: split BY the near-dup COMPONENT
    // instead of the doc id, so a train/test boundary can never run
    // through a near-dup cluster (the contamination a doc-keyed split
    // permits silently). One statement composition: cluster minhash →
    // split by component. Oracle = the CC component chain + the salted
    // bucket cut on the COMPONENT value.
    Gate("hb_leakage_safe_split",
      (s, d) => Graft.runHb(
        """index rows by doc_id
          |cluster minhash text 0.5
          |split 90/10 by component 'ls1'
          |create column doc_id keys
          |slice columns doc_id component split
          |""".stripMargin, t(s, d, "documents"))
        .orderBy(col("doc_id")),
      Some(s"""WITH RECURSIVE ${SimilarityGates.minhashCcCompCtesSql}
           |SELECT doc_id, component,
           |  CASE WHEN b < 9000 THEN 'train' ELSE 'test' END AS split
           |FROM (SELECT doc_id, component,
           |  CAST('0x' || SUBSTR(md5(CAST(component AS VARCHAR)
           |    || ':ls1'), 1, 8) AS BIGINT) % 10000 AS b
           |  FROM __comp)
           |ORDER BY doc_id ASC NULLS FIRST""".stripMargin)),

    // `rebalance by source [...]` through the text surface — same
    // Sampling.rebalance call (x/100.0 is the correctly-rounded double
    // of the literal the library twin passes) and same oracle as
    // t_mix_rebalance.
    Gate("hb_rebalance",
      (s, d) => Graft.runHb(
        """index rows by doc_id
          |rebalance by source [src0 40; src1 30; src2 20; src3 10] 'reb1'
          |create column doc_id keys
          |slice columns doc_id source
          |""".stripMargin, t(s, d, "documents"))
        .orderBy(col("doc_id")),
      Some(TextGates.rebalanceOracleSql)),

    // The r9 statements CHAINED through one parsed program: fractional
    // selection feeds the weighted rebalance feeds the epoch shuffle —
    // rank is computed on the selection's survivors, the mass cuts on
    // the rebalance's input, the epoch positions on the final kept set.
    // The whole pipeline replays as one SQL chain.
    Gate("hb_pipeline_r9",
      (s, d) => Graft.runHb(
        """index rows by doc_id
          |top 50 pct by n_chars per lang
          |rebalance by lang weight n_chars [en 40; de 30; fr 30] 'p9'
          |shuffle 'ep9'
          |create column doc_id keys
          |slice columns doc_id lang n_chars rank shuffle_pos
          |""".stripMargin, t(s, d, "documents"))
        .orderBy(col("shuffle_pos")),
      Some("""WITH sel AS (
        |  SELECT doc_id, lang, n_chars, rank FROM (
        |    SELECT doc_id, lang, n_chars,
        |      ROW_NUMBER() OVER (PARTITION BY lang
        |        ORDER BY n_chars DESC, doc_id ASC) AS rank,
        |      COUNT(*) OVER (PARTITION BY lang) AS n
        |    FROM documents)
        |  WHERE rank <= (n * 50 + 99) // 100),
        |cnt AS (
        |  SELECT lang AS st, CAST(SUM(n_chars) AS BIGINT) AS n
        |  FROM sel GROUP BY lang),
        |tgt(st, t) AS (VALUES ('en', 0.4), ('de', 0.3), ('fr', 0.3)),
        |j AS (SELECT c.st, c.n, t.t FROM cnt c JOIN tgt t USING (st)),
        |cap AS (SELECT MIN(n / t) AS cap FROM j),
        |cut AS (SELECT st,
        |    CAST(FLOOR(LEAST(cap * t / n, 1.0) * 10000 + 0.5)
        |      AS BIGINT) AS cut
        |  FROM j, cap),
        |kept AS (
        |  SELECT s2.doc_id, s2.lang, s2.n_chars, s2.rank FROM sel s2
        |  JOIN cut ON cut.st = s2.lang
        |  WHERE CAST('0x' || SUBSTR(md5(CAST(s2.doc_id AS VARCHAR)
        |      || ':p9'), 1, 8) AS BIGINT) % 10000 < cut.cut)
        |SELECT doc_id, lang, n_chars, CAST(rank AS INTEGER) AS rank,
        |  CAST(ROW_NUMBER() OVER (ORDER BY
        |    CAST('0x' || SUBSTR(md5(CAST(doc_id AS VARCHAR) || ':ep9'),
        |      1, 8) AS BIGINT), doc_id) AS BIGINT) AS shuffle_pos
        |FROM kept
        |ORDER BY shuffle_pos ASC NULLS FIRST""".stripMargin)),

    // The r10 artifact layout through the text surface: the pipeline
    // chain extended one statement further — `shards 8` places the
    // shuffled epoch into balanced contiguous blocks
    // (Sampling.epochShards on shuffle_pos), the exact layout
    // Sinks.writeShards materializes.
    Gate("hb_epoch_shards",
      (s, d) => Graft.runHb(
        """index rows by doc_id
          |top 50 pct by n_chars per lang
          |rebalance by lang weight n_chars [en 40; de 30; fr 30] 'p10'
          |shuffle 'ep10h'
          |shards 8
          |create column doc_id keys
          |slice columns shard pos_in_shard shuffle_pos doc_id lang
          |""".stripMargin, t(s, d, "documents"))
        .orderBy(col("shard"), col("pos_in_shard")),
      Some("""WITH sel AS (
        |  SELECT doc_id, lang, n_chars FROM (
        |    SELECT doc_id, lang, n_chars,
        |      ROW_NUMBER() OVER (PARTITION BY lang
        |        ORDER BY n_chars DESC, doc_id ASC) AS rank,
        |      COUNT(*) OVER (PARTITION BY lang) AS n
        |    FROM documents)
        |  WHERE rank <= (n * 50 + 99) // 100),
        |cnt AS (
        |  SELECT lang AS st, CAST(SUM(n_chars) AS BIGINT) AS n
        |  FROM sel GROUP BY lang),
        |tgt(st, t) AS (VALUES ('en', 0.4), ('de', 0.3), ('fr', 0.3)),
        |j AS (SELECT c.st, c.n, t.t FROM cnt c JOIN tgt t USING (st)),
        |cap AS (SELECT MIN(n / t) AS cap FROM j),
        |cut AS (SELECT st,
        |    CAST(FLOOR(LEAST(cap * t / n, 1.0) * 10000 + 0.5)
        |      AS BIGINT) AS cut
        |  FROM j, cap),
        |kept AS (
        |  SELECT s2.doc_id, s2.lang FROM sel s2
        |  JOIN cut ON cut.st = s2.lang
        |  WHERE CAST('0x' || SUBSTR(md5(CAST(s2.doc_id AS VARCHAR)
        |      || ':p10'), 1, 8) AS BIGINT) % 10000 < cut.cut),
        |shuf AS (
        |  SELECT doc_id, lang,
        |    CAST(ROW_NUMBER() OVER (ORDER BY
        |      CAST('0x' || SUBSTR(md5(CAST(doc_id AS VARCHAR)
        |        || ':ep10h'), 1, 8) AS BIGINT), doc_id) AS BIGINT)
        |      AS shuffle_pos,
        |    COUNT(*) OVER () AS nn
        |  FROM kept)
        |SELECT ((shuffle_pos - 1) * 8) // nn AS shard,
        |  shuffle_pos
        |    - ((((shuffle_pos - 1) * 8) // nn) * nn + 7) // 8
        |    AS pos_in_shard,
        |  shuffle_pos, doc_id, lang
        |FROM shuf
        |ORDER BY shard ASC NULLS FIRST,
        |  pos_in_shard ASC NULLS FIRST""".stripMargin)),

    // Fractional upsampling through the text surface — same salt and
    // factors as t_upsample, so the library oracle replays verbatim
    // (the statement compiles to Sampling.upsampleByFactor on the
    // frame key, which `index rows by doc_id` sets to doc_id).
    Gate("hb_upsample",
      (s, d) => Graft.runHb(
        """index rows by doc_id
          |upsample by lang [en 2.5; de 0.5; zh 0] 'up10'
          |slice columns doc_id rep lang n_chars
          |""".stripMargin, t(s, d, "documents"))
        .orderBy(col("doc_id"), col("rep")),
      Some(graft.queries.TextGates.upsampleOracleSql)),

    // Replica-aware epoch layout through the text surface: `upsample`
    // recomposes the frame key to doc:rep, so the following
    // `shuffle`/`shards` order REPLICAS totally — the key-recomposition
    // contract proven end to end (`keys` exposes the composite).
    Gate("hb_upsample_epoch",
      (s, d) => Graft.runHb(
        """index rows by doc_id
          |upsample by lang [en 1.5] 'uh10'
          |shuffle 'ue10'
          |shards 4
          |create column rep_key keys
          |slice columns shard pos_in_shard shuffle_pos rep_key lang
          |""".stripMargin, t(s, d, "documents"))
        .orderBy(col("shard"), col("pos_in_shard")),
      Some("""WITH up AS (
        |  SELECT doc_id, lang,
        |    1 + (CASE WHEN CAST('0x' || SUBSTR(md5(
        |          CAST(doc_id AS VARCHAR) || ':uh10'), 1, 8) AS BIGINT)
        |          % 10000
        |        < (CASE lang WHEN 'en' THEN 5000 ELSE 0 END)
        |      THEN 1 ELSE 0 END) AS n
        |  FROM documents),
        |reps AS (
        |  SELECT doc_id, lang,
        |    CAST(unnest(range(n)) AS INTEGER) AS rep
        |  FROM up),
        |keyed AS (
        |  SELECT lang,
        |    CAST(doc_id AS VARCHAR) || ':' || CAST(rep AS VARCHAR)
        |      AS rep_key
        |  FROM reps),
        |shuf AS (
        |  SELECT rep_key, lang,
        |    CAST(ROW_NUMBER() OVER (ORDER BY
        |      CAST('0x' || SUBSTR(md5(rep_key || ':ue10'), 1, 8)
        |        AS BIGINT), rep_key) AS BIGINT) AS shuffle_pos,
        |    COUNT(*) OVER () AS nn
        |  FROM keyed)
        |SELECT ((shuffle_pos - 1) * 4) // nn AS shard,
        |  shuffle_pos
        |    - ((((shuffle_pos - 1) * 4) // nn) * nn + 3) // 4
        |    AS pos_in_shard,
        |  shuffle_pos, rep_key, lang
        |FROM shuf
        |ORDER BY shard ASC NULLS FIRST,
        |  pos_in_shard ASC NULLS FIRST""".stripMargin)),

    // Curriculum-ordered shards through the text surface: `curriculum`
    // emits the same shuffle_pos ordinal contract as `shuffle`, so
    // `shards` composes unchanged — the first shards hold the easiest
    // band (an annealed run streams them in shard order).
    Gate("hb_curriculum_shards",
      (s, d) => Graft.runHb(
        """index rows by doc_id
          |curriculum by n_chars 3 'cu10h'
          |shards 4
          |slice columns shard pos_in_shard band shuffle_pos doc_id
          |""".stripMargin, t(s, d, "documents"))
        .orderBy(col("shard"), col("pos_in_shard")),
      Some("""WITH b AS (
        |  SELECT doc_id,
        |    CAST(NTILE(3) OVER (ORDER BY n_chars ASC, doc_id ASC)
        |      AS INTEGER) AS band
        |  FROM documents),
        |shuf AS (
        |  SELECT doc_id, band,
        |    CAST(ROW_NUMBER() OVER (ORDER BY band ASC,
        |      CAST('0x' || SUBSTR(md5(CAST(doc_id AS VARCHAR)
        |        || ':cu10h'), 1, 8) AS BIGINT), doc_id) AS BIGINT)
        |      AS shuffle_pos,
        |    COUNT(*) OVER () AS nn
        |  FROM b)
        |SELECT ((shuffle_pos - 1) * 4) // nn AS shard,
        |  shuffle_pos
        |    - ((((shuffle_pos - 1) * 4) // nn) * nn + 3) // 4
        |    AS pos_in_shard,
        |  band, shuffle_pos, doc_id
        |FROM shuf
        |ORDER BY shard ASC NULLS FIRST,
        |  pos_in_shard ASC NULLS FIRST""".stripMargin)),

    // The budget-mix chain through the text surface: ONE statement
    // plans the mixture ("hold 1M chars at en 50 / de 20 / fr 30")
    // and upsamples to the planned factors (epochPlan →
    // epochPlanFactors → upsampleByFactor, strata outside the target
    // list dropped), then shuffle + shards place the replicated
    // corpus — the t_budget_mix flagship authorable from the closed
    // DSL, same salts, same oracle machinery.
    Gate("hb_budget_mix",
      (s, d) => Graft.runHb(
        """index rows by doc_id
          |upsample by lang weight n_chars [en 50; de 20; fr 30] budget 1000000 'bm10'
          |shuffle 'bm10e'
          |shards 4
          |create column rep_id keys
          |slice columns shard pos_in_shard shuffle_pos rep_id lang
          |""".stripMargin, t(s, d, "documents"))
        .orderBy(col("shard"), col("pos_in_shard")),
      Some("""WITH cnt AS (
        |  SELECT lang, CAST(SUM(n_chars) AS BIGINT) AS mass
        |  FROM documents WHERE lang IN ('en', 'de', 'fr')
        |  GROUP BY lang),
        |tgt(st, t) AS (VALUES ('en', 0.5), ('de', 0.2), ('fr', 0.3)),
        |plan AS (
        |  SELECT c.lang,
        |    CAST(FLOOR(1000000 * t.t / c.mass * 10000 + 0.5) AS BIGINT)
        |      AS f1e4
        |  FROM cnt c JOIN tgt t ON t.st = c.lang),
        |up AS (
        |  SELECT d.doc_id, d.lang,
        |    (p.f1e4 // 10000)
        |    + (CASE WHEN CAST('0x' || SUBSTR(md5(CAST(d.doc_id AS VARCHAR)
        |          || ':bm10'), 1, 8) AS BIGINT) % 10000
        |        < (p.f1e4 % 10000) THEN 1 ELSE 0 END) AS n
        |  FROM documents d JOIN plan p ON p.lang = d.lang),
        |reps AS (
        |  SELECT doc_id, lang,
        |    CAST(unnest(range(n)) AS INTEGER) AS rep
        |  FROM up),
        |keyed AS (
        |  SELECT lang,
        |    CAST(doc_id AS VARCHAR) || ':' || CAST(rep AS VARCHAR)
        |      AS rep_id
        |  FROM reps),
        |shuf AS (
        |  SELECT rep_id, lang,
        |    CAST(ROW_NUMBER() OVER (ORDER BY
        |      CAST('0x' || SUBSTR(md5(rep_id || ':bm10e'), 1, 8)
        |        AS BIGINT), rep_id) AS BIGINT) AS shuffle_pos,
        |    COUNT(*) OVER () AS nn
        |  FROM keyed)
        |SELECT ((shuffle_pos - 1) * 4) // nn AS shard,
        |  shuffle_pos
        |    - ((((shuffle_pos - 1) * 4) // nn) * nn + 3) // 4
        |    AS pos_in_shard,
        |  shuffle_pos, rep_id, lang
        |FROM shuf
        |ORDER BY shard ASC NULLS FIRST,
        |  pos_in_shard ASC NULLS FIRST""".stripMargin)),

    // The r10 statement pipeline: the round's whole statement family
    // chained through ONE parsed program — fractional selection →
    // fractional upsampling (key forks to doc:rep) → curriculum
    // banding over the replicated corpus → shard placement. Every
    // stage consumes the previous stage's survivors/replicas, and the
    // whole chain replays as one SQL pipeline.
    Gate("hb_pipeline_r10",
      (s, d) => Graft.runHb(
        """index rows by doc_id
          |top 50 pct by n_chars per lang
          |upsample by lang [en 2.5; de 1.5] 'pu10'
          |curriculum by n_chars 3 'pc10'
          |shards 4
          |create column rep_key keys
          |slice columns shard pos_in_shard band shuffle_pos rep_key lang n_chars
          |""".stripMargin, t(s, d, "documents"))
        .orderBy(col("shard"), col("pos_in_shard")),
      Some("""WITH sel AS (
        |  SELECT doc_id, lang, n_chars FROM (
        |    SELECT doc_id, lang, n_chars,
        |      ROW_NUMBER() OVER (PARTITION BY lang
        |        ORDER BY n_chars DESC, doc_id ASC) AS rank,
        |      COUNT(*) OVER (PARTITION BY lang) AS n
        |    FROM documents)
        |  WHERE rank <= (n * 50 + 99) // 100),
        |up AS (
        |  SELECT doc_id, lang, n_chars,
        |    (CASE lang WHEN 'en' THEN 2 WHEN 'de' THEN 1 ELSE 1 END)
        |    + (CASE WHEN CAST('0x' || SUBSTR(md5(
        |          CAST(doc_id AS VARCHAR) || ':pu10'), 1, 8) AS BIGINT)
        |          % 10000
        |        < (CASE lang WHEN 'en' THEN 5000 WHEN 'de' THEN 5000
        |           ELSE 0 END)
        |      THEN 1 ELSE 0 END) AS nrep
        |  FROM sel),
        |reps AS (
        |  SELECT doc_id, lang, n_chars,
        |    CAST(unnest(range(nrep)) AS INTEGER) AS rep
        |  FROM up),
        |keyed AS (
        |  SELECT lang, n_chars,
        |    CAST(doc_id AS VARCHAR) || ':' || CAST(rep AS VARCHAR)
        |      AS rep_key
        |  FROM reps),
        |banded AS (
        |  SELECT lang, n_chars, rep_key,
        |    CAST(NTILE(3) OVER (ORDER BY n_chars ASC, rep_key ASC)
        |      AS INTEGER) AS band
        |  FROM keyed),
        |shuf AS (
        |  SELECT lang, n_chars, rep_key, band,
        |    CAST(ROW_NUMBER() OVER (ORDER BY band ASC,
        |      CAST('0x' || SUBSTR(md5(rep_key || ':pc10'), 1, 8)
        |        AS BIGINT), rep_key) AS BIGINT) AS shuffle_pos,
        |    COUNT(*) OVER () AS nn
        |  FROM banded)
        |SELECT ((shuffle_pos - 1) * 4) // nn AS shard,
        |  shuffle_pos
        |    - ((((shuffle_pos - 1) * 4) // nn) * nn + 3) // 4
        |    AS pos_in_shard,
        |  band, shuffle_pos, rep_key, lang, n_chars
        |FROM shuf
        |ORDER BY shard ASC NULLS FIRST,
        |  pos_in_shard ASC NULLS FIRST""".stripMargin)),

    // The fractional selection form through the text surface: keep the
    // best quarter of every language by n_chars — compiles to
    // Selection.topFracPerStratum(1/4 ≡ 25 pct).
    Gate("hb_select_topfrac",
      (s, d) => Graft.runHb(
        """index rows by doc_id
          |top 25 pct by n_chars per lang
          |create column doc_id keys
          |slice columns lang rank doc_id n_chars
          |""".stripMargin, t(s, d, "documents"))
        .orderBy(col("lang"), col("rank")),
      Some("""SELECT lang, CAST(rank AS INTEGER) AS rank, doc_id, n_chars
        |FROM (SELECT lang, doc_id, n_chars,
        |        ROW_NUMBER() OVER (PARTITION BY lang
        |          ORDER BY n_chars DESC, doc_id ASC) AS rank,
        |        COUNT(*) OVER (PARTITION BY lang) AS n
        |      FROM documents)
        |WHERE rank <= (n * 25 + 99) // 100
        |ORDER BY lang ASC NULLS FIRST, rank ASC NULLS FIRST""".stripMargin)),

    // The weighted rebalance clause through the text surface — same
    // rebalanceByWeight call (char-mass mix) and same oracle as the
    // Scala-surface twin t_rebalance_tokens.
    Gate("hb_rebalance_weight",
      (s, d) => Graft.runHb(
        """index rows by doc_id
          |rebalance by source weight n_chars [src0 40; src1 30; src2 20; src3 10] 'reb2'
          |create column doc_id keys
          |slice columns doc_id source n_chars
          |""".stripMargin, t(s, d, "documents"))
        .orderBy(col("doc_id")),
      Some(TextGates.rebalanceTokensOracleSql)),

    // `shuffle 'ep0'` through the text surface — the deterministic
    // epoch order as a statement, same range-exchange ordinals and same
    // oracle as t_shuffle_order.
    Gate("hb_shuffle",
      (s, d) => Graft.runHb(
        """index rows by doc_id
          |shuffle 'ep0'
          |create column doc_id keys
          |slice columns doc_id source shuffle_pos
          |""".stripMargin, t(s, d, "documents"))
        .orderBy(col("shuffle_pos")),
      Some(
        """SELECT doc_id, source,
          |  CAST(ROW_NUMBER() OVER (ORDER BY
          |    CAST('0x' || SUBSTR(md5(CAST(doc_id AS VARCHAR) || ':ep0'),
          |      1, 8) AS BIGINT), doc_id) AS BIGINT) AS shuffle_pos
          |FROM documents
          |ORDER BY shuffle_pos ASC NULLS FIRST""".stripMargin)),

    // `encode text 64` through the text surface — same Vocab.fitEncode
    // call and same oracle as the Scala-surface twin t_vocab_encode.
    // The gate projects the id array to its space-joined string form
    // (null-preserving scalar) for the comparison harness.
    Gate("hb_encode",
      (s, d) => Graft.runHb(
        """index rows by doc_id
          |encode text 64
          |create column doc_id keys
          |slice columns doc_id token_ids
          |""".stripMargin, t(s, d, "documents"))
        .select(col("doc_id"),
          when(col("token_ids").isNotNull,
            concat_ws(" ", col("token_ids"))).as("token_ids_str"))
        .orderBy(col("doc_id")),
      Some(TextGates.vocabOracleSql)),

    // r9 statement twins: stratified selection and BPE through the
    // closed DSL, and the LM-surprisal filter as a configuration
    // source — each sharing the library gate's oracle machinery.
    Gate("hb_select_topk",
      (s, d) => Graft.runHb(
        """index rows by doc_id
          |top 5 by n_chars per source
          |create column doc_id keys
          |slice columns source rank doc_id n_chars
          |""".stripMargin, t(s, d, "documents"))
        .orderBy(col("source"), col("rank")),
      Some("""SELECT source, CAST(rank AS INTEGER) AS rank, doc_id, n_chars
        |FROM (SELECT source, doc_id, n_chars,
        |        ROW_NUMBER() OVER (PARTITION BY source
        |          ORDER BY n_chars DESC, doc_id ASC) AS rank
        |      FROM documents)
        |WHERE rank <= 5
        |ORDER BY source ASC NULLS FIRST, rank ASC NULLS FIRST""".stripMargin)),

    Gate("hb_bpe",
      (s, d) => Graft.runHb(
        """index rows by doc_id
          |bpe text 8
          |create column doc_id keys
          |slice columns doc_id bpe
          |""".stripMargin, t(s, d, "documents"))
        .orderBy(col("doc_id")),
      Some(TextGates.bpeEncodeOracleSql)),

    // Document-aligned best-fit-decreasing packing through the
    // statement surface (r11): per-document placement (shard, bin,
    // bin_offset), the oracle replaying the BFD fold per shard as a
    // recursive CTE that also carries each step's assigned bin/offset.
    Gate("hb_pack_bins",
      (s, d) => Graft.runHb(
        """index rows by doc_id
          |pack bins n_chars 1024 8
          |create column doc_id keys
          |slice columns doc_id shard bin bin_offset
          |""".stripMargin, t(s, d, "documents"))
        .orderBy(col("doc_id")),
      Some("""WITH RECURSIVE s AS (
        |  SELECT doc_id, n_chars,
        |    CAST('0x' || SUBSTR(md5(CAST(doc_id AS VARCHAR) || ':pack'), 1, 8)
        |      AS BIGINT) % 8 AS shard
        |  FROM documents),
        |dd AS (SELECT doc_id, n_chars, shard,
        |    ROW_NUMBER() OVER (PARTITION BY shard
        |      ORDER BY n_chars DESC, doc_id) AS rn
        |  FROM s),
        |fd AS (
        |  SELECT shard, CAST(0 AS BIGINT) AS rn,
        |    CAST([] AS BIGINT[]) AS rems,
        |    CAST(NULL AS BIGINT) AS abin, CAST(NULL AS BIGINT) AS aoff
        |  FROM (SELECT DISTINCT shard FROM s)
        |  UNION ALL
        |  SELECT dd.shard, fd.rn + 1,
        |    CASE WHEN list_min(list_filter(fd.rems,
        |        r -> r >= dd.n_chars)) IS NULL
        |      THEN list_append(fd.rems, 1024 - dd.n_chars)
        |      ELSE fd.rems[:list_position(fd.rems, list_min(
        |          list_filter(fd.rems, r -> r >= dd.n_chars))) - 1]
        |        || [list_min(list_filter(fd.rems,
        |             r -> r >= dd.n_chars)) - dd.n_chars]
        |        || fd.rems[list_position(fd.rems, list_min(
        |          list_filter(fd.rems, r -> r >= dd.n_chars))) + 1:]
        |    END,
        |    CASE WHEN list_min(list_filter(fd.rems,
        |        r -> r >= dd.n_chars)) IS NULL
        |      THEN CAST(len(fd.rems) AS BIGINT)
        |      ELSE CAST(list_position(fd.rems, list_min(
        |        list_filter(fd.rems, r -> r >= dd.n_chars))) - 1 AS BIGINT)
        |    END,
        |    CASE WHEN list_min(list_filter(fd.rems,
        |        r -> r >= dd.n_chars)) IS NULL
        |      THEN CAST(0 AS BIGINT)
        |      ELSE 1024 - list_min(list_filter(fd.rems,
        |        r -> r >= dd.n_chars))
        |    END
        |  FROM fd JOIN dd ON dd.shard = fd.shard AND dd.rn = fd.rn + 1)
        |SELECT dd.doc_id, dd.shard, fd.abin AS bin, fd.aoff AS bin_offset
        |FROM dd JOIN fd ON fd.shard = dd.shard AND fd.rn = dd.rn
        |ORDER BY doc_id ASC NULLS FIRST""".stripMargin)),

    // Hybrid retrieval through the configuration algebra (RetrieveOf →
    // Graft.retrieve): the corpus is ITSELF a configuration join
    // (documents ⋈ renamed embeddings on doc_id), seeds a filtered
    // merge of it — then one retrieval source fuses both modalities.
    // The r12 FLAGSHIP — the PRETRAINING-MIX pipeline end to end, every
    // stage authored in the closed DSL (configuration algebra + one
    // statement chain per tier): ingest → n-gram decontamination
    // (DeconOf vs the doc_id<25 eval slice) → SEMANTIC decontamination
    // (SemDeconOf over the aligned embeddings, 0.25 fixed-point
    // threshold) → C4-style quality filter (tokens ≥ 20, duplicate-token
    // mass ≤ 0.55 — the synthetic corpus is repetition-heavy, median 0.54) → cross-corpus passage scrub (ScrubOf: eval-quoted
    // 8-windows excised) → exact dedup on the scrubbed text → stratified
    // domain mix (src2 100%, src3 80%, rest 60%) → byte-level BPE ids
    // (`bpe ids`, the GPT-2-layout trainer-input arrays) → `emit packed`
    // (budget 256, 4 shards): corpus → padded input_ids in ONE program.
    // The trained byte table ALSO round-trips through the GPT-2
    // vocab.json/merges.txt interchange (sinks.TokenizerFiles) inside
    // the gate — a require() gates the hash on artifact losslessness.
    // ONE oracle replays the whole chain: decon grams, quantized
    // cosines, the quality signals, window coverage + reconstruction,
    // fingerprint dedup, salted mix buckets, six training rounds, id
    // mapping, and the packing cumsum — the t_sft_artifact pattern at
    // full pipeline width. 100 TB shape: every stage is the already-
    // audited operator (broadcast eval sides, digest-only shuffles,
    // salted narrow sampling, one shard exchange for the emit).
    Gate("hb_pretrain_e2e", (s, d) => {
      import graft.hb.Configurations._
      val configs = Map(
        "evaldocs" -> conf(TableSource("documents"), "only (doc_id < 25)"),
        "pool" -> conf(TableSource("documents"), "only (doc_id >= 25)"),
        "ngflag" -> conf(
          DeconOf("pool", "evaldocs", "doc_id", "text", n = 4),
          "slice columns doc_id source text contaminated"),
        "evalemb" -> conf(TableSource("embeddings"), "only (vec_id < 25)"),
        "poolemb" -> conf(TableSource("embeddings"), "only (vec_id >= 25)"),
        "semflag" -> conf(
          SemDeconOf("poolemb", "evalemb", "vec_id", "embedding",
            thresholdFp = 250000000L),
          """rename column vec_id doc_id
            |rename column contaminated semdup
            |slice columns doc_id semdup
            |""".stripMargin),
        "filtered" -> conf(JoinOf("ngflag", "semflag", "doc_id"),
          """index rows by doc_id
            |only ((! contaminated) && (! semdup))
            |only (tokens (text) >= 20)
            |only (repetition (text) <= 0.55)
            |""".stripMargin),
        "cleaned" -> conf(
          ScrubOf("filtered", "evaldocs", "doc_id", "text", 8),
          """index rows by doc_id
            |dedup exact scrubbed
            |mix by source [src2 100; src3 80] 60 'pmx'
            |only (tokens (scrubbed) > 0)
            |create column doc_id keys
            |slice columns doc_id source scrubbed
            |""".stripMargin),
        "tokenized" -> conf(MergeOf(Seq("cleaned")),
          """index rows by doc_id
            |bpe ids scrubbed 6
            |""".stripMargin),
        "artifact" -> conf(MergeOf(Seq("tokenized")),
          """index rows by doc_id
            |emit packed token_ids 256 4
            |slice columns shard seq n_docs n_tokens input_ids doc_starts
            |""".stripMargin))
      // truncatePlans: every configuration materializes ONCE (lazy
      // localCheckpoint) and downstream configurations analyze a leaf
      // instead of the growing 9-stage chain — r17 profiled ~1.9 s of
      // per-run Catalyst re-analysis driver gap plus re-executions the
      // r16 gate-level persist of "cleaned" only partly covered.
      // In-run only; Bench clears caches between timed runs and the
      // checkpoint blocks are GC-cleaned with the memoized frames.
      val runner = new Runner(s, t0 => t(s, d, t0), truncatePlans = true)
      // task-3 weave, r13 single-fit form: the byte table the
      // `bpe ids` statement trained rides on token_ids' COLUMN
      // METADATA (Engine BpeIdsEnc → Bpe.mergesMetadata), so the GPT-2
      // file round-trip asserts against THE SAME fit — one fit in the
      // gate's whole job graph (the Runner memoizes "tokenized", and
      // the metadata tap is schema-only: zero Spark jobs,
      // EngineSpec pins it). The gate only hashes green if the
      // artifact is lossless.
      val tokenized = runner.run(configs, "tokenized")
      val merges = graft.operators.Bpe
        .mergesFromMetadata(tokenized.schema, "token_ids")
        .getOrElse(throw new IllegalStateException(
          "pretrain flagship: bpe ids published no merge metadata"))
      val dir = java.nio.file.Files
        .createTempDirectory("graft_pretrain_tok").toString
      graft.sinks.TokenizerFiles.writeGpt2(dir, merges)
      require(graft.sinks.TokenizerFiles.readGpt2(dir) == merges,
        "pretrain flagship: GPT-2 tokenizer artifact did not round-trip")
      runner.run(configs, "artifact").orderBy(col("shard"), col("seq"))
    },
      Some(HbGates.pretrainE2eOracleSql)),

    // Identical parameters to s_hybrid_rrf (pools 20, k 10, df 780,
    // doc_id < 5 seeds) → shared oracle, so the algebra form is pinned
    // to hash-match the library form.
    Gate("hb_retrieve_cfg",
      (s, d) => {
        import graft.hb.Configurations._
        val configs = Map(
          "docs" -> Conf(TableSource("documents"), Nil),
          "embs" -> conf(TableSource("embeddings"),
            "rename column vec_id doc_id"),
          "corpus" -> Conf(JoinOf("docs", "embs", "doc_id"), Nil),
          "seeds" -> conf(MergeOf(Seq("corpus")), "only (doc_id < 5)"),
          "hits" -> conf(
            RetrieveOf("corpus", "seeds", "doc_id", "text", "embedding",
              k = 10, maxDfPermille = 780),
            "slice columns query_id rank neighbor_id rrf_fp n_lists"))
        new Runner(s, t0 => t(s, d, t0)).run(configs, "hits")
          .orderBy(col("query_id"), col("rank"))
      },
      Some(SimilarityGates.hybridRrfOracleSql)),

    // Unigram-LM statement surface (r11): the SentencePiece family as
    // one DSL line — candidate fit + Viterbi-EM + min-cost
    // segmentation. Shares t_unigram's full unrolled-DP oracle.
    Gate("hb_unigram",
      (s, d) => Graft.runHb(
        """index rows by doc_id
          |unigram text 16
          |slice columns doc_id ug n_pieces
          |""".stripMargin, t(s, d, "documents"))
        .orderBy(col("doc_id")),
      Some(TextGates.unigramDocOracleSql)),

    // WordPiece statement surface (r11): the BERT tokenizer family as
    // one DSL line — fit 6 likelihood-ranked merges on the frame,
    // greedy-encode every doc (wp + n_pieces). Shares t_wordpiece's
    // full round-unrolled oracle.
    Gate("hb_wordpiece",
      (s, d) => Graft.runHb(
        """index rows by doc_id
          |wordpiece text 6
          |slice columns doc_id wp n_pieces
          |""".stripMargin, t(s, d, "documents"))
        .orderBy(col("doc_id")),
      Some(TextGates.wordPieceDocOracleSql)),

    // Preference-pair (DPO) statement surface (r11): synthetic prompts
    // of 4 docs each, token-count score, best-vs-worst pairing with a
    // ≥2 margin. The frame key keeps doc_id's integer type (index
    // rows by), so the id tie-breaks are numeric — replayed directly.
    Gate("hb_dpo_pairs",
      (s, d) => Graft.runHb(
        """index rows by doc_id
          |create column prompt_id (int (doc_id / 4))
          |create column score_fp (tokens (text))
          |pairs text score_fp by prompt_id 2
          |slice columns prompt_id chosen_id rejected_id chosen rejected chosen_score_fp rejected_score_fp margin_fp n_candidates
          |""".stripMargin, t(s, d, "documents"))
        .orderBy(col("prompt_id")),
      Some("""WITH cand AS (
        |  SELECT doc_id AS sid,
        |    CAST(doc_id // 4 AS INTEGER) AS prompt_id, text,
        |    len(regexp_extract_all(text, '\S+')) AS score_fp
        |  FROM documents),
        |r1 AS (
        |  SELECT *,
        |    ROW_NUMBER() OVER (PARTITION BY prompt_id
        |      ORDER BY score_fp DESC, sid ASC) AS rc,
        |    ROW_NUMBER() OVER (PARTITION BY prompt_id
        |      ORDER BY score_fp ASC, sid DESC) AS rr,
        |    COUNT(*) OVER (PARTITION BY prompt_id) AS n
        |  FROM cand),
        |ch AS (SELECT prompt_id, sid AS chosen_id, text AS chosen,
        |         score_fp AS chosen_score_fp, n FROM r1 WHERE rc = 1),
        |rj AS (SELECT prompt_id, sid AS rejected_id, text AS rejected,
        |         score_fp AS rejected_score_fp FROM r1 WHERE rr = 1)
        |SELECT prompt_id, chosen_id, rejected_id, chosen, rejected,
        |  chosen_score_fp, rejected_score_fp,
        |  chosen_score_fp - rejected_score_fp AS margin_fp,
        |  n AS n_candidates
        |FROM ch JOIN rj USING (prompt_id)
        |WHERE n >= 2 AND chosen_score_fp - rejected_score_fp >= 2
        |ORDER BY prompt_id ASC NULLS FIRST""".stripMargin)),

    // The one-statement training-artifact path (r11): vocabulary
    // encode -> spanning sequence emit, entirely as DSL text; the
    // oracle replays ids, placement, slice portions, padding and the
    // attention-reset offsets.
    Gate("hb_emit_packed",
      (s, d) => Graft.runHb(
        """index rows by doc_id
          |encode text 64
          |emit packed token_ids 512 4
          |slice columns shard seq n_docs n_tokens input_ids doc_starts
          |""".stripMargin, t(s, d, "documents"))
        .orderBy(col("shard"), col("seq")),
      Some(TextGates.hbEmitPackedOracleSql)),

    // The r11 DSL pipeline flagship: corpus → training artifact as ONE
    // program — exact dedup, deterministic 80% train cut, vocabulary
    // fit ON THE KEPT SET, spanning sequence emit. Every stage has its
    // own gate; this one pins the composition (the vocabulary — and
    // therefore every id — depends on what dedup+split kept).
    Gate("hb_sft_pipeline",
      (s, d) => Graft.runHb(
        """index rows by doc_id
          |dedup exact text
          |split 80/10/10 by doc_id 's1'
          |only (split = 'train')
          |encode text 64
          |emit packed token_ids 512 4
          |slice columns shard seq n_docs n_tokens input_ids doc_starts
          |""".stripMargin, t(s, d, "documents"))
        .orderBy(col("shard"), col("seq")),
      Some(TextGates.hbSftPipelineOracleSql)),

    // position_ids through the DSL (r12): the emit statements now carry
    // the third trainer column — per-cell positions restarting at every
    // doc_start, 0 in padding (Packing.positionIds). Same chain as
    // hb_sft_pipeline; the oracle replays every position cell.
    Gate("hb_emit_positions",
      (s, d) => Graft.runHb(
        """index rows by doc_id
          |encode text 64
          |emit packed token_ids 512 4
          |slice columns shard seq position_ids
          |""".stripMargin, t(s, d, "documents"))
        .orderBy(col("shard"), col("seq")),
      Some(TextGates.hbEmitPositionsOracleSql)),

    // SFT THROUGH THE DSL (r13 — the `sft` statement + the aligned
    // emit's loss_bounds ride-along): (prompt, response) pairs render
    // with the RESERVED chat tags, ONE specials-aware byte fit, exact
    // per-document loss_start, then `emit aligned` lands
    // `bin_offset + loss_start` in the artifact as per-sequence
    // loss_bounds — a trainer masks [doc_starts_k, loss_bounds_k) per
    // document. ONE oracle replays pairs → segment corpus → six
    // rounds → reserved-id streams → BFD placement recursion →
    // per-bin concatenation with the boundary arithmetic.
    Gate("hb_sft_chat", (s, d) => {
      val tk = filter(graft.operators.Decontaminate.tokens(col("text")),
        w => length(w) > 0)
      val n = size(tk)
      val half = floor((n + lit(1)) / lit(2)).cast("int")
      val pairs = t(s, d, "documents").select(col("doc_id"),
          array_join(slice(tk, lit(1), half), " ").as("prompt"),
          array_join(slice(tk, half + 1, n - half), " ").as("response"))
        .filter(length(col("response")) > 0)
      graft.hb.Graft.runHb(
        """index rows by doc_id
          |sft prompt response 6
          |emit aligned token_ids 1024 4
          |slice columns shard bin n_docs n_tokens input_ids doc_starts loss_bounds labels
          |""".stripMargin, pairs)
        .orderBy(col("shard"), col("bin"))
    },
      Some(TextGates.hbSftChatOracleSql)),

    // The document-aligned twin through the DSL (r11): same chain with
    // the best-fit-decreasing placement.
    Gate("hb_emit_aligned",
      (s, d) => Graft.runHb(
        """index rows by doc_id
          |encode text 64
          |emit aligned token_ids 512 4
          |slice columns shard bin n_docs n_tokens input_ids doc_starts
          |""".stripMargin, t(s, d, "documents"))
        .orderBy(col("shard"), col("bin")),
      Some(TextGates.hbEmitAlignedOracleSql)),

    // Byte-level tokenizer through the statement surface (r11): encode
    // + the lossless `decode bytes` inverse chained in one program —
    // the oracle checks the subword stream AND that text_decoded is
    // byte-identical to the input.
    Gate("hb_bpe_bytes",
      (s, d) => Graft.runHb(
        """index rows by doc_id
          |bpe bytes text 6
          |decode bytes bpe
          |create column doc_id keys
          |slice columns doc_id bpe text_decoded
          |""".stripMargin, t(s, d, "documents"))
        .orderBy(col("doc_id")),
      Some(TextGates.hbBpeBytesOracleSql)),

    // Unigram trainer-input ids through the statement surface (r12 —
    // `unigram ids`): the refined model's pieces as sorted-order id
    // arrays ([UNK]=0). Completes the tokenizer-ids triple next to
    // `bpe ids` and `wordpiece ids`.
    Gate("hb_unigram_ids",
      (s, d) => Graft.runHb(
        """index rows by doc_id
          |unigram ids text 16
          |create column doc_id keys
          |slice columns doc_id ids_str n_ids
          |""".stripMargin, t(s, d, "documents"))
        .orderBy(col("doc_id")),
      Some(TextGates.unigramIdsOracleSql)),

    // BERT input_ids through the statement surface (r12 — `wordpiece
    // ids`): the same fit + final vocabulary as `wordpiece`, emitted as
    // vocabFrame-layout id arrays. Shares t_wordpiece_ids' full oracle.
    Gate("hb_wordpiece_ids",
      (s, d) => Graft.runHb(
        """index rows by doc_id
          |wordpiece ids text 6
          |create column doc_id keys
          |slice columns doc_id ids_str n_ids
          |""".stripMargin, t(s, d, "documents"))
        .orderBy(col("doc_id")),
      Some(TextGates.wordPieceIdsOracleSql)),

    // WordPiece RESERVED tags through the statement surface (r14 —
    // `wordpiece ids … tags`): the listed strings segment atomically
    // before the lowercasing walk, are EXCLUDED from the fit corpus
    // (segmentedCorpus — so the fit statistics equal the untagged
    // text's), and carry dedicated ids N+1+k. Shares
    // t_wordpiece_specials' full oracle: the engine's fit over the
    // segmented tagged column reproduces the raw-text fit exactly
    // (whitespace tokens are invariant under tag splicing).
    Gate("hb_wordpiece_tags",
      (s, d) => Graft.runHb(
        """index rows by doc_id
          |wordpiece ids tagged 6 tags '<|DOC|>' '<|END|>'
          |create column doc_id keys
          |slice columns doc_id ids_str n_ids
          |""".stripMargin,
        t(s, d, "documents").select(col("doc_id"),
          concat(lit("<|DOC|> "), col("text"), lit(" <|END|>"))
            .as("tagged")))
        .orderBy(col("doc_id")),
      Some(TextGates.wordPieceSpecialsOracleSql)),

    // Unigram reserved tags through the statement surface (r14 —
    // `unigram ids … tags`): same discipline for the third family;
    // shares t_unigram_specials' full oracle.
    Gate("hb_unigram_tags",
      (s, d) => Graft.runHb(
        """index rows by doc_id
          |unigram ids tagged 16 tags '<|DOC|>' '<|END|>'
          |create column doc_id keys
          |slice columns doc_id ids_str n_ids
          |""".stripMargin,
        t(s, d, "documents").select(col("doc_id"),
          concat(lit("<|DOC|> "), col("text"), lit(" <|END|>"))
            .as("tagged")))
        .orderBy(col("doc_id")),
      Some(TextGates.unigramSpecialsOracleSql)),

    // The trainer-input ids form through the statement surface (r12 —
    // `bpe ids`): the same byte-level table as `bpe bytes`, emitted as
    // GPT-2-layout id arrays, the shape `emit packed` consumes. The
    // gate projects the array to its space-joined form for the
    // comparison harness; library users get the array.
    Gate("hb_bpe_ids",
      (s, d) => Graft.runHb(
        """index rows by doc_id
          |bpe ids text 6
          |create column doc_id keys
          |slice columns doc_id token_ids n_ids
          |""".stripMargin, t(s, d, "documents"))
        .select(col("doc_id"),
          concat_ws(" ", col("token_ids")).as("ids_str"), col("n_ids"))
        .orderBy(col("doc_id")),
      Some(TextGates.hbBpeIdsOracleSql)),

    // BATCH id round trip off COLUMN METADATA (r13): `decode ids
    // token_ids` with no `using` clause binds the merge table the same
    // program's `bpe ids` statement published on token_ids' metadata —
    // zero refit, the two sides cannot bind different tables by
    // construction. Oracle: the ids chain + text_decoded ≡ text.
    Gate("hb_ids_roundtrip",
      (s, d) => Graft.runHb(
        """index rows by doc_id
          |bpe ids text 6
          |decode ids token_ids
          |create column doc_id keys
          |slice columns doc_id token_ids n_ids text_decoded
          |""".stripMargin, t(s, d, "documents"))
        .select(col("doc_id"),
          concat_ws(" ", col("token_ids")).as("ids_str"), col("n_ids"),
          col("text_decoded"))
        .orderBy(col("doc_id")),
      Some(TextGates.hbIdsRoundtripOracleSql)),

    // Exact repeated-substring removal through the DSL (r13 —
    // `dedup substrings text 8` = SubstringDedup.scrubRepeats on the
    // frame key): the EXACTSUBSTR scrub as one statement. Shares the
    // d_substring_dedup oracle's coverage/reconstruction chain.
    Gate("hb_substring_dedup",
      (s, d) => Graft.runHb(
        """index rows by doc_id
          |dedup substrings text 8
          |create column doc_id keys
          |slice columns doc_id scrubbed n_removed
          |""".stripMargin, t(s, d, "documents"))
        .orderBy(col("doc_id")),
      Some(TextGates.hbSubstringDedupOracleSql)),

    Gate("hb_surprisal_cfg",
      (s, d) => {
        import graft.hb.Configurations._
        val configs = Map(
          "ref" -> conf(TableSource("documents"),
            "only ((source = 'src0') || (source = 'src1'))"),
          "corpus" -> conf(TableSource("documents"),
            "only ((source != 'src0') && (source != 'src1'))"),
          "fluent" -> conf(
            SurprisalOf("corpus", "ref", "doc_id", "text",
              buckets = 4096, salt = "lm", maxAvg1000 = 10200L),
            "slice columns doc_id source avg1000"))
        new Runner(s, t0 => t(s, d, t0)).run(configs, "fluent")
          .orderBy(col("doc_id"))
      },
      Some("WITH " + TextGates.surprisalCtesSql + "\n" +
        """SELECT a.doc_id, d.source, a.avg1000
          |FROM agg a JOIN documents d ON a.doc_id = d.doc_id
          |WHERE a.avg1000 <= 10200
          |ORDER BY a.doc_id ASC NULLS FIRST""".stripMargin)),

    // CCNet-style perplexity-head selection (r12 — the Wenzek et al.
    // 2020 recipe): score the corpus against a reference-LM
    // configuration (SurprisalOf with a keep-all ceiling), then keep
    // the most-fluent QUARTILE per language — `top 25 pct by` on the
    // negated score, so the exact-rational ceil threshold replays. The
    // whole selection is configuration algebra + statements; ONE
    // oracle replays model fit, scoring, per-lang ranking and the
    // rational cut.
    Gate("hb_ccnet_head",
      (s, d) => {
        import graft.hb.Configurations._
        val configs = Map(
          "ref" -> conf(TableSource("documents"),
            "only ((source = 'src0') || (source = 'src1'))"),
          "corpus" -> conf(TableSource("documents"),
            "only ((source != 'src0') && (source != 'src1'))"),
          "head" -> conf(
            SurprisalOf("corpus", "ref", "doc_id", "text",
              buckets = 4096, salt = "lm", maxAvg1000 = 1000000000L),
            """index rows by doc_id
              |create column negscore (0 - avg1000)
              |top 25 pct by negscore per lang
              |create column doc_id keys
              |slice columns doc_id lang avg1000 rank
              |""".stripMargin))
        new Runner(s, t0 => t(s, d, t0)).run(configs, "head")
          .orderBy(col("doc_id"))
      },
      Some("WITH " + TextGates.surprisalCtesSql + ",\n" +
        """ccsc AS (
          |  SELECT a.doc_id, d.lang, a.avg1000
          |  FROM agg a JOIN documents d USING (doc_id)),
          |ccr AS (
          |  SELECT doc_id, lang, avg1000,
          |    ROW_NUMBER() OVER (PARTITION BY lang
          |      ORDER BY -avg1000 DESC, doc_id ASC) AS rank,
          |    COUNT(*) OVER (PARTITION BY lang) AS n
          |  FROM ccsc)
          |SELECT doc_id, lang, avg1000, CAST(rank AS INTEGER) AS rank
          |FROM ccr WHERE rank <= (n * 25 + 99) // 100
          |ORDER BY doc_id ASC NULLS FIRST""".stripMargin)),

    // Three-configuration combinator: the corpus filtered by the NB
    // margin under positive/negative seed configurations — the Scala
    // t_nb_classify path as a configuration source, sharing its CTEs.
    Gate("hb_classifier_cfg",
      (s, d) => {
        import graft.hb.Configurations._
        val configs = Map(
          "posseed" -> conf(TableSource("documents"),
            "only ((source = 'src0') || (source = 'src1'))"),
          "negseed" -> conf(TableSource("documents"),
            "only ((source = 'src2') || (source = 'src3'))"),
          "corpus" -> conf(TableSource("documents"),
            "only ((source != 'src0') && (source != 'src1') && " +
              "(source != 'src2') && (source != 'src3'))"),
          "edu" -> conf(
            ClassifierOf("corpus", "posseed", "negseed", "doc_id", "text",
              buckets = 4096, salt = "nb", minMargin1000 = 0L),
            "slice columns doc_id source margin1000"))
        new Runner(s, t0 => t(s, d, t0)).run(configs, "edu")
          .orderBy(col("doc_id"))
      },
      Some("WITH " + TextGates.classifierCtesSql + "\n" +
        """SELECT f.doc_id, d.source, f.margin1000
          |FROM fin f JOIN documents d ON f.doc_id = d.doc_id
          |WHERE f.margin1000 >= 0
          |ORDER BY f.doc_id ASC NULLS FIRST""".stripMargin)),

    // `diverse 8 [embedding]` — the k-center coreset through the
    // closed DSL, sharing s_kcenter's unrolled selection-trace oracle.
    Gate("hb_diverse",
      (s, d) => Graft.runHb(
        """index rows by vec_id
          |diverse 8 [embedding]
          |create column vec_id keys
          |slice columns rank vec_id maxsim_fp
          |""".stripMargin, t(s, d, "embeddings"))
        .orderBy(col("rank")),
      Some(SimilarityGates.kCenterOracleSql(k = 8))),

    // Vocabulary coverage as a configuration source: the corpus scored
    // against a vocab fitted on the full table — same Vocab.coverage
    // call and same oracle as the Scala twin t_oov_rate.
    Gate("hb_coverage_cfg",
      (s, d) => {
        import graft.hb.Configurations._
        val configs = Map(
          "docs" -> conf(TableSource("documents"), ""),
          "report" -> conf(
            CoverageOf("docs", "docs", "source", "text", size = 64),
            "slice columns source n_tokens n_oov oov_permille"))
        new Runner(s, t0 => t(s, d, t0)).run(configs, "report")
          .orderBy(col("source"))
      },
      Some(TextGates.oovOracleSql)),

    // Drift as a configuration source: snapshot QA between two
    // configurations — same Drift.topMovers call and same oracle as
    // the Scala-surface twin t_corpus_drift.
    Gate("hb_drift_cfg",
      (s, d) => {
        import graft.hb.Configurations._
        val configs = Map(
          "snap_a" -> conf(TableSource("documents"),
            "only (contains source ['src0'; 'src1'; 'src2'; 'src3'; 'src4'])"),
          "snap_b" -> conf(TableSource("documents"),
            "only (!(contains source ['src0'; 'src1'; 'src2'; 'src3'; 'src4']))"),
          "report" -> conf(DriftOf("snap_a", "snap_b", "text", k = 15),
            "slice columns direction rank token cnt_a cnt_b ratio"))
        new Runner(s, t0 => t(s, d, t0)).run(configs, "report")
          .orderBy(col("direction"), col("rank"))
      },
      Some(TextGates.driftOracleSql)),

    Gate("hb_neighbors",
      (s, d) => Graft.runHb(neighborsHb, t(s, d, "embeddings"))
        .orderBy(col("query_id"), col("rank")),
      Some(SimilarityGates.annTopkOracleSql)),

    // The s_ann_pq twin through the closed DSL: `neighbors … pq 8`
    // compiles to Similarity.pqTopK with the statement-pinned
    // configuration (16 codes, re-rank 50) — same oracle, so the
    // surface cannot drift from the Scala path.
    Gate("hb_neighbors_pq",
      (s, d) => Graft.runHb(
        """index rows by vec_id
          |neighbors 10 [embedding] [keys < 5] pq 8
          |""".stripMargin, t(s, d, "embeddings"))
        .orderBy(col("query_id"), col("rank")),
      Some(SimilarityGates.pqOracleSql(m = 8, dim = 64, codes = 16,
        iters = 3, rerank = 50, k = 10))),

    // The s_ann_mmr twin: `neighbors … mmr 7` — greedy λ=0.7 diversity
    // re-rank over the exact pool of 50, sharing the unrolled oracle.
    Gate("hb_neighbors_mmr",
      (s, d) => Graft.runHb(
        """index rows by vec_id
          |neighbors 10 [embedding] [keys < 5] mmr 7
          |""".stripMargin, t(s, d, "embeddings"))
        .orderBy(col("query_id"), col("rank")),
      Some(SimilarityGates.mmrOracleSql(k = 10, pool = 50,
        lamTenths = 7))),

    // The s_ann_ivf twin: `neighbors … ivf 16` — deterministic coarse
    // cells, nprobe=4, sharing the IVF chain oracle.
    Gate("hb_neighbors_ivf",
      (s, d) => Graft.runHb(
        """index rows by vec_id
          |neighbors 10 [embedding] [keys < 5] ivf 16
          |""".stripMargin, t(s, d, "embeddings"))
        .orderBy(col("query_id"), col("rank")),
      Some(SimilarityGates.ivfOracleSql)),

    Gate("hb_extrapolate",
      (s, d) => Graft.runHb(extrapHb, t(s, d, "part"))
        .orderBy(col("fc")),
      Some("""WITH m AS (SELECT MAX(p_partkey) AS mx FROM part)
             |SELECT CAST(p_partkey*3+7 AS BIGINT) AS y,
             |  CAST(p_partkey*3+7 AS DOUBLE) AS fc
             |FROM part
             |UNION ALL
             |SELECT NULL, CAST((mx + i)*3+7 AS DOUBLE)
             |FROM range(1, 6) t(i), m
             |ORDER BY fc ASC NULLS FIRST""".stripMargin)),

    // S10 lineage cache end-to-end: a two-stage configuration chain runs
    // through Configurations.Runner with a parquet LineageCache twice —
    // the second run (a fresh Runner, same cache) serves BOTH stages from
    // the cached parquet (Types.fs:182-202 scheme), and that round-tripped
    // result is what the oracle hash-checks. Closes the one subsystem that
    // was spec-only (ConfigurationsSpec proves prefix reuse; this proves
    // the cached bytes are the right answer).
    Gate("s10_lineage_cache",
      (s, d) => {
        import graft.hb.Configurations._
        val root = java.nio.file.Files
          .createTempDirectory("graft-lineage-gate").toString
        val cache = new graft.cache.LineageCache(s, root)
        val configs = Map(
          "filtered" -> conf(TableSource("part"),
            """only (p_size > 20)
              |create column half (p_retailprice / 2)
              |slice columns p_brand half
              |""".stripMargin),
          "top" -> conf(MergeOf(Seq("filtered")),
            """group by p_brand -> sum
              |create column p_brand keys
              |sort by column p_brand
              |""".stripMargin))
        def resolve(t0: String) = t(s, d, t0)
        new Runner(s, resolve, Some(cache)).run(configs, "top") // populate
        new Runner(s, resolve, Some(cache)).run(configs, "top") // cached
          .orderBy(col("p_brand"))
      },
      // half is summed through the engine's deterministic decimal path
      // (reduceDet), which the oracle mirrors; parquet round-trips doubles
      // bit-exactly, so the cached read hash-matches.
      Some("""SELECT
             |  CAST(SUM(CAST(p_retailprice / 2 AS DECIMAL(30,6))) AS DOUBLE) AS half,
             |  p_brand
             |FROM part WHERE p_size > 20 GROUP BY p_brand
             |ORDER BY p_brand ASC NULLS FIRST""".stripMargin)),

    // Text-analysis signals as first-class `.hb` EXPRESSIONS
    // (Ast.TextSig → functions.TextSignals): a curation author writes
    // `only (quality (text) > 0.3)` the way the reference's closed DSL
    // lets them write any other expression — no Scala required. This
    // program composes tokens/repetition/quality in create column AND
    // only; the oracle re-derives all three signals from first
    // principles.
    Gate("hb_quality_filter",
      (s, d) => Graft.runHb(
        """create column nt (tokens (text))
          |create column rep (repetition (text))
          |create column q (quality (text))
          |only (q > 0.3 && rep < 0.55)
          |slice columns doc_id nt rep q
          |""".stripMargin, t(s, d, "documents"))
        .orderBy(col("doc_id")),
      Some("""WITH sig AS (
             |  SELECT doc_id,
             |    len(regexp_extract_all(text, '\S+')) AS nt0,
             |    len(regexp_extract_all(text, '[.,;:!?]')) AS np,
             |    len(regexp_extract_all(lower(text), '\b(the|a|an|and|or|of|to|in|is|it)\b')) AS ns,
             |    string_split_regex(lower(regexp_replace(text, '\s+', ' ', 'g')), '\s+') AS tk
             |  FROM documents),
             |sc AS (
             |  SELECT doc_id,
             |    CAST(nt0 AS INTEGER) AS nt,
             |    CAST(len(tk) - len(list_distinct(tk)) AS DOUBLE) / len(tk) AS rep,
             |    LEAST(nt0 * 1.0 / 100.0, 1.0)
             |      * (1.0 - LEAST(np * 1.0 / (nt0 + 1), 1.0))
             |      * (0.5 + LEAST(ns * 1.0 / (nt0 + 1), 0.5)) AS q
             |  FROM sig)
             |SELECT doc_id, nt, rep, q FROM sc
             |WHERE q > 0.3 AND rep < 0.55
             |ORDER BY doc_id ASC NULLS FIRST""".stripMargin)),

    // `langid (e)` in expression position, composed with if/else and a
    // `quality` predicate inside `only` — the language-aware filter
    // shape (keep high-quality docs, record the prediction vs the
    // labeled lang).
    Gate("hb_langid_signal",
      (s, d) => Graft.runHb(HbGates.langidSignalHb, t(s, d, "documents"))
        .orderBy(col("doc_id")),
      Some(HbGates.langidSignalOracleSql)),

    // The two-frame extension combinators at the CONFIGURATION level
    // (the reference's join/merge-provider shape, Types.fs:97-104): the
    // eval set is a second configuration bound as the DeconOf operand,
    // corpus/eval are both pure `.hb` filters over the same table, and
    // the downstream projection is a `.hb` statement chain. The
    // broadcast-eval-grams plan is the same as t_decontaminate — only
    // the authoring surface changed.
    Gate("hb_decontaminate_cfg",
      (s, d) => {
        import graft.hb.Configurations._
        val configs = Map(
          "eval" -> conf(TableSource("documents"), "only (doc_id < 25)"),
          "corpus" -> conf(TableSource("documents"), "only (doc_id >= 25)"),
          "flagged" -> conf(DeconOf("corpus", "eval", "doc_id", "text", n = 4),
            "slice columns doc_id contaminated"))
        new Runner(s, t0 => t(s, d, t0)).run(configs, "flagged")
          .orderBy(col("doc_id"))
      },
      Some(HbGates.deconCfgOracleSql)),

    // Fuzzy decontamination as a configuration source (NearDupOf): the
    // d_minhash_decon operator with BOTH sides .hb-authored — the
    // SEMANTIC twin of hb_decontaminate_cfg (SemDeconOf → Graft
    // .semanticDecon): the same 495/5 embeddings split and 0.25
    // threshold as s_semantic_decon, shared oracle — catches
    // paraphrased leakage the n-gram flag misses, through the
    // configuration algebra.
    Gate("hb_semdecon_cfg",
      (s, d) => {
        import graft.hb.Configurations._
        val configs = Map(
          "eval" -> conf(TableSource("embeddings"), "only (vec_id >= 495)"),
          "corpus" -> conf(TableSource("embeddings"), "only (vec_id < 495)"),
          "flagged" -> conf(
            SemDeconOf("corpus", "eval", "vec_id", "embedding",
              thresholdFp = 250000000L),
            "slice columns vec_id max_cos_fp contaminated"))
        new Runner(s, t0 => t(s, d, t0)).run(configs, "flagged")
          .orderBy(col("vec_id"))
      },
      Some(SimilarityGates.semDeconOracleSql)),

    // near-dup twin of hb_decontaminate_cfg, same doc_id split, same
    // verified-pairs oracle machinery filtered to straddling pairs.
    Gate("hb_neardup_cfg",
      (s, d) => {
        import graft.hb.Configurations._
        val configs = Map(
          "eval" -> conf(TableSource("documents"), "only (doc_id < 25)"),
          "corpus" -> conf(TableSource("documents"), "only (doc_id >= 25)"),
          "flagged" -> conf(
            NearDupOf("corpus", "eval", "doc_id", "text", threshold = 0.5),
            "slice columns doc_id neardup"))
        new Runner(s, t0 => t(s, d, t0)).run(configs, "flagged")
          .orderBy(col("doc_id"))
      },
      Some(SimilarityGates.minhashCrossOracleSql("doc_id < 25"))),

    // Cross-corpus scrub as a configuration source (ScrubOf): the
    // editing decontamination with BOTH sides .hb-authored — corpus
    // docs keep everything except eval-quoted 8-token windows. Same
    // doc_id split as hb_neardup_cfg; oracle replays coverage +
    // reconstruction on that split.
    Gate("hb_scrub_cfg",
      (s, d) => {
        import graft.hb.Configurations._
        val configs = Map(
          "eval" -> conf(TableSource("documents"), "only (doc_id < 25)"),
          "corpus" -> conf(TableSource("documents"),
            "only (doc_id >= 25)"),
          "clean" -> conf(
            ScrubOf("corpus", "eval", "doc_id", "text", 8),
            "slice columns doc_id n_tokens n_removed scrubbed"))
        new Runner(s, t0 => t(s, d, t0)).run(configs, "clean")
          .select(col("doc_id"), col("n_tokens"), col("n_removed"),
            md5(col("scrubbed")).as("scrubbed_md5"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH tok AS (
        |  SELECT doc_id,
        |    string_split(lower(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS tk
        |  FROM documents),
        |w AS (
        |  SELECT doc_id, i, md5(array_to_string(tk[i:i+7], ' ')) AS fp
        |  FROM tok, unnest(range(1, greatest(len(tk) - 7, 0) + 1)) AS t(i)),
        |ev AS (SELECT DISTINCT fp FROM w WHERE doc_id < 25),
        |cov AS (
        |  SELECT DISTINCT w.doc_id, w.i + j.j AS pos
        |  FROM w JOIN ev USING (fp), unnest(range(0, 8)) AS j(j)
        |  WHERE w.doc_id >= 25),
        |cva AS (SELECT doc_id, list(pos) AS cv FROM cov GROUP BY doc_id),
        |cl AS (
        |  SELECT t.doc_id,
        |    CAST(len(t.tk) AS BIGINT) AS n_tokens,
        |    list_transform(
        |      list_filter(range(1, len(t.tk) + 1),
        |        p -> c.cv IS NULL OR NOT list_contains(c.cv, p)),
        |      p -> t.tk[p]) AS kept
        |  FROM tok t LEFT JOIN cva c USING (doc_id)
        |  WHERE t.doc_id >= 25)
        |SELECT doc_id, n_tokens,
        |  CAST(n_tokens - len(kept) AS BIGINT) AS n_removed,
        |  md5(COALESCE(array_to_string(kept, ' '), '')) AS scrubbed_md5
        |FROM cl ORDER BY doc_id ASC NULLS FIRST""".stripMargin)),

    // DSIR importance selection as a configuration source (DsirOf):
    // raw and target are both `.hb`-authored source filters, the
    // selection binds them as operands, and the projection is a `.hb`
    // slice — same fixed-point score and Ordinals rank as the
    // Scala-surface twin t_dsir_select, same oracle.
    Gate("hb_dsir_cfg",
      (s, d) => {
        import graft.hb.Configurations._
        val configs = Map(
          "target" -> conf(TableSource("documents"),
            "only ((source = 'src0') || (source = 'src1'))"),
          "raw" -> conf(TableSource("documents"),
            "only ((source != 'src0') && (source != 'src1'))"),
          "selected" -> conf(
            DsirOf("raw", "target", "doc_id", "text", pct = 20),
            "slice columns doc_id source score_fp"))
        new Runner(s, t0 => t(s, d, t0)).run(configs, "selected")
          .orderBy(col("doc_id"))
      },
      Some(TextGates.dsirOracleSql)),

    // As-of join as a configuration source (AsofOf): the purchases side
    // is a `.hb`-authored filter configuration, bound as the right
    // operand; output columns are then a `.hb` slice. Identical
    // union-window plan (one co-shuffle on user_id) and identical
    // oracle to the Scala-surface twin j2_asof_join.
    Gate("hb_asof_cfg",
      (s, d) => {
        import graft.hb.Configurations._
        val configs = Map(
          "events_all" -> conf(TableSource("events"),
            "slice columns event_id user_id ts"),
          "purchases" -> conf(TableSource("events"),
            """only (event_type = 'purchase')
              |slice columns user_id ts value
              |""".stripMargin),
          "enriched" -> conf(
            AsofOf("events_all", "purchases", "ts", "ts",
              Seq("user_id"), Seq("user_id"), Seq("value"), prefix = "ref_"),
            "slice columns event_id user_id ref_ts ref_value"))
        new Runner(s, t0 => t(s, d, t0)).run(configs, "enriched")
          .orderBy(col("event_id"))
      },
      Some("""WITH r AS (
             |  SELECT user_id, ts, value FROM events
             |  WHERE event_type = 'purchase')
             |SELECT l.event_id, l.user_id,
             |  r.ts AS ref_ts, r.value AS ref_value
             |FROM events l ASOF LEFT JOIN r
             |  ON l.user_id = r.user_id AND l.ts >= r.ts
             |ORDER BY event_id ASC NULLS FIRST""".stripMargin)),

    // The third two-frame combinator (RangeOf) end-to-end from pure
    // `.hb`+configuration input: clicks inside the 30 minutes before
    // each purchase, per user — the j3_range_join shape, but both sides
    // are `.hb`-authored configurations (`int ("ts")` = epoch seconds;
    // the window arithmetic is plain expression math) and the
    // aggregation is an `.hb` group-by. Same binned equi-join plan —
    // no nested loop.
    Gate("hb_range_cfg",
      (s, d) => {
        import graft.hb.Configurations._
        val configs = Map(
          "clicks" -> conf(TableSource("events"),
            """only (event_type = 'click')
              |create column pt (int ("ts"))
              |slice columns user_id pt
              |""".stripMargin),
          "purchase_windows" -> conf(TableSource("events"),
            """only (event_type = 'purchase')
              |create column we (int ("ts"))
              |create column ws (we - 1800)
              |rename column event_id purchase_id
              |slice columns purchase_id user_id ws we
              |""".stripMargin),
          "in_window" -> conf(
            RangeOf("clicks", "purchase_windows", "pt", "ws", "we",
              Seq("user_id"), Seq("user_id"), binWidth = 1800L),
            """create column tick 1
              |slice columns purchase_id tick
              |group by purchase_id -> sum
              |create column purchase_id keys
              |sort by column purchase_id
              |""".stripMargin))
        new Runner(s, t0 => t(s, d, t0)).run(configs, "in_window")
          .orderBy(col("purchase_id"))
      },
      Some("""WITH p AS (
             |  SELECT user_id, CAST(date_part('epoch', ts) AS INTEGER) AS pt
             |  FROM events WHERE event_type = 'click'),
             |i AS (
             |  SELECT event_id AS purchase_id, user_id,
             |    CAST(date_part('epoch', ts) AS INTEGER) - 1800 AS ws,
             |    CAST(date_part('epoch', ts) AS INTEGER) AS we
             |  FROM events WHERE event_type = 'purchase')
             |SELECT CAST(COUNT(*) AS BIGINT) AS tick, i.purchase_id
             |FROM i JOIN p
             |  ON p.user_id = i.user_id AND p.pt BETWEEN i.ws AND i.we
             |GROUP BY i.purchase_id
             |ORDER BY purchase_id ASC NULLS FIRST""".stripMargin)),

    // S1 OData provider, driver-checked END-TO-END over REAL HTTP
    // (r14): an in-process com.sun.net.httpserver fixture
    // (sources/ODataFixture) serves the documents parquet as paged
    // OData JSON — $select/$filter honored server-side, every response
    // capped at 100 rows with an @odata.nextLink continuation (the
    // reference's pagination loop, tools/visualizer/cli/src/
    // ODataProvider.fs:70-87). The DSv2 source reads it through the
    // DEFAULT HttpFetcher over loopback: filter pushdown reaches the
    // wire as `$filter=(n_chars ne null) and (n_chars ge 200)`, column
    // pruning as `$select=doc_id,lang,n_chars` (the wide text column
    // never crosses), and the executor walks the continuation chain.
    // Oracle: the same table read directly. ODataSourceSpec pins the
    // pruning counters (rows served ≈ result size, pages > 1).
    Gate("s1_odata_provider",
      (s, d) => {
        val docs = t(s, d, "documents")
        val url = graft.sources.ODataFixture.serve(docs,
          "documents_" + d.replaceAll("[^A-Za-z0-9]", "_"),
          pageCap = 100)
        s.read.format("graft-odata")
          .schema(docs.schema)
          .option("url", url)
          .load()
          .filter(col("n_chars") >= 200L)
          .select(col("doc_id"), col("lang"), col("n_chars"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, lang, n_chars FROM documents
             |WHERE n_chars >= 200
             |ORDER BY doc_id ASC NULLS FIRST""".stripMargin)),

    // S2 REST provider, driver-checked end-to-end in-process (the same
    // move as s10: zero-egress sandbox, so the HTTP layer is a fake
    // Fetcher with a deterministic two-URL payload, but the parse →
    // uniform → aggregate path is the real provider code). The oracle
    // recomputes from a VALUES literal of the same feed.
    Gate("s2_rest_provider",
      (s, d) => {
        val fetch = new graft.sources.Providers.Fetcher {
          def get(url: String, auth: Option[(String, String)]): String =
            url match {
              case "http://feed/1" =>
                """{"values": [
                  |  {"region": "emea", "qty": 3, "amt": 10.5},
                  |  {"region": "apac", "qty": 1, "amt": 2.25}
                  |]}""".stripMargin
              case _ =>
                """{"values": [
                  |  {"region": "emea", "qty": 2, "amt": 4.75},
                  |  {"region": "amer", "qty": 6, "amt": 1.0}
                  |]}""".stripMargin
            }
        }
        graft.sources.Providers.rest(s,
          Seq("http://feed/1", "http://feed/2"), Some("values"),
          auth = None, fetch = fetch)
          .groupBy(col("region"))
          .agg(sum(col("qty")).as("qty"), Det.dsum(col("amt")).as("amt"))
          .orderBy(col("region"))
      },
      Some("""SELECT region, CAST(SUM(qty) AS BIGINT) AS qty,
             |  CAST(SUM(CAST(amt AS DECIMAL(30,6))) AS DOUBLE) AS amt
             |FROM (VALUES ('emea', 3, 10.5), ('apac', 1, 2.25),
             |             ('emea', 2, 4.75), ('amer', 6, 1.0))
             |  AS t(region, qty, amt)
             |GROUP BY region ORDER BY region ASC NULLS FIRST""".stripMargin)),

    // S5 localdata provider (the reference's inline test-data source,
    // workers/calculator.worker/tests: rows of typed literals) through a
    // real .hb program — filter, grouped deterministic sums, sort.
    Gate("s5_localdata",
      (s, d) => graft.hb.Graft.runHb(
        """only (qty > 1)
          |group by cat -> sum
          |create column cat keys
          |sort by column cat
          |""".stripMargin,
        graft.sources.Ingest.localData(s, Seq("cat", "qty", "price"),
          Seq(Seq("a", 1L, 1.5), Seq("a", 3L, 2.25), Seq("b", 2L, 4.0),
            Seq("b", 5L, 0.5), Seq("c", 1L, 9.75))))
        .orderBy(col("cat")),
      Some("""SELECT CAST(SUM(qty) AS BIGINT) AS qty,
             |  CAST(SUM(CAST(price AS DECIMAL(30,6))) AS DOUBLE) AS price,
             |  cat
             |FROM (VALUES ('a', 1, 1.5), ('a', 3, 2.25), ('b', 2, 4.0),
             |             ('b', 5, 0.5), ('c', 1, 9.75))
             |  AS t(cat, qty, price)
             |WHERE qty > 1 GROUP BY cat
             |ORDER BY cat ASC NULLS FIRST""".stripMargin)),

    // The Logic Commit Frequency.hb SHAPE as a driver-checked gate
    // (r16): the three semantics the golden witness pinned — numeric
    // `= ''` as the serialized-missing check (MTTR.hb:21), `sort by
    // column <name>` where <name> was just consumed as the group key
    // (Logic Commit Frequency.hb:38), and the moving mean over the
    // renamed count — replayed against a full SQL oracle on `events`.
    Gate("hb_commit_freq_shape",
      (s, d) => graft.hb.Graft.runHb(
        """create column v2 (if [event_type = 'view'] {value} else {missing})
          |only !(v2 = '')
          |create column "date" (format date ts date)
          |create column tick 1
          |slice columns "date" tick
          |group by date -> sum
          |rename column tick "count"
          |sort by column date
          |create column freq (moving mean 5 ["count"])
          |only !(freq = missing)
          |create column "date" keys
          |slice columns "date" freq
          |""".stripMargin, t(s, d, "events"))
        .orderBy(col("date")),
      Some("""WITH g AS (
             |  SELECT CAST(ts AS DATE) AS date,
             |    CAST(COUNT(*) AS BIGINT) AS cnt
             |  FROM events WHERE event_type = 'view' GROUP BY 1)
             |SELECT date, freq FROM (
             |  SELECT date,
             |    CASE WHEN ROW_NUMBER() OVER (ORDER BY date) >= 5
             |      THEN AVG(cnt) OVER (ORDER BY date
             |        ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
             |    END AS freq
             |  FROM g)
             |WHERE freq IS NOT NULL
             |ORDER BY date ASC NULLS FIRST""".stripMargin)),

    // Flattened dotted column names end-to-end (r16): Ingest.flatten
    // emits literal `a.b` columns (the reference corpus renames
    // `Iteration.IterationName`, `committer.date`); every engine
    // reference — create/slice/group/sort — must backtick-quote
    // (Engine.ucol) or Spark parses the dot as a struct path.
    Gate("hb_dotted_columns",
      (s, d) => graft.hb.Graft.runHb(
        """create column "geo.country" (if [(user_id % 2) = 0] {'dk'} else {'se'})
          |create column tick 1
          |slice columns "geo.country" tick
          |group by "geo.country" -> sum
          |create column country keys
          |sort by column country
          |""".stripMargin, t(s, d, "events"))
        .orderBy(col("country")),
      Some("""SELECT CAST(COUNT(*) AS BIGINT) AS tick,
             |  CASE WHEN user_id % 2 = 0 THEN 'dk' ELSE 'se' END AS country
             |FROM events GROUP BY 2
             |ORDER BY country ASC NULLS FIRST""".stripMargin))
  )
}
