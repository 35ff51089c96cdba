package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Sequence-packing layout for LLM training: documents are concatenated
  * in id order and chopped into fixed `budget`-token sequences (the
  * GPT-style pretraining layout — documents SPAN sequence boundaries, no
  * padding waste). This operator computes each document's PLACEMENT:
  * which sequence its first token lands in, which its last, and the
  * offset within the first sequence. Downstream writers emit the actual
  * token streams from the layout; the layout is the part that needs the
  * whole corpus view.
  *
  * Scale design: a global concatenation order would be a single ordered
  * window; instead documents are sharded by salted hash
  * ([[Sampling.hashBucket]]) and concatenated per shard — sequences
  * never cross shards, shards pack in parallel, and the per-shard
  * cumulative sum is one keyed window (shuffle by shard, linear in
  * rows). Deterministic: (salt, shards, budget) fully determine the
  * layout on any cluster and any partitioning — same property as
  * [[Sampling]], so incremental re-packs are reproducible.
  */
object Packing {

  /** Placement of each document: `shard`, `seq_first`/`seq_last`
    * (0-based sequence ordinals WITHIN the shard), and `seq_offset` (the
    * document's first-token offset inside `seq_first`). Zero-token
    * documents occupy their start sequence. `tokens` must be
    * non-negative (and non-null — nulls raise like a null id). Ids must
    * be UNIQUE: the placement is keyed on id order within a shard, so a
    * duplicated id makes the two rows' offsets order-dependent (the same
    * class of silent corruption the null-id raise guards against —
    * id-keyed corpora satisfy this by construction). */
  def packedLayout(df: DataFrame, idCol: String, tokensCol: String,
      budget: Long, shards: Int = 64, salt: String = "pack"): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(shards > 0, s"shards must be positive, got $shards")
    val tokens = col(tokensCol).cast("long")
    val guarded = when(tokens.isNull || tokens < 0,
      raise_error(concat(lit(s"packedLayout: bad token count "),
        coalesce(tokens.cast("string"), lit("null")))).cast("long"))
      .otherwise(tokens)
    // shard straight off the 32-bit hash — stacking % Buckets % shards
    // would skew every shard count that doesn't divide 10000
    val shard = Sampling.hash32(col(idCol), salt) % shards
    val w = Window.partitionBy("__shard").orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    // `div`, not `/`: long `/` coerces to double, which near 2^53 can
    // round a quotient across an integer boundary — `div` is exact
    // integer division at any magnitude, like the oracle's `//`
    df.withColumn("__shard", shard)
      .withColumn("__t", guarded)
      .withColumn("__before", coalesce(sum(col("__t")).over(w), lit(0L)))
      .withColumn("__end",
        col("__before") + greatest(col("__t"), lit(1L)) - 1)
      .select(col(idCol), col("__shard").as("shard"),
        expr(s"__before div ${budget}L").as("seq_first"),
        expr(s"__end div ${budget}L").as("seq_last"),
        (col("__before") % budget).as("seq_offset"))
  }

  /** DOCUMENT-ALIGNED sequence bins — the other packing regime: each
    * document is placed WHOLE into one fixed-`budget` sequence
    * (SFT/instruction-tuning packing, where a document crossing a
    * sequence boundary corrupts the loss mask), so unlike
    * [[packedLayout]] the layout policy now decides real padding waste.
    * Adds `shard`, `bin` (0-based sequence ordinal within the shard)
    * and `bin_offset` (the document's first-token offset in its bin).
    *
    * Two policy axes, both deterministic per shard:
    *   - order: `decreasing = false` packs in id order (arrival);
    *     `decreasing = true` packs largest-first (`tokens` DESC, id
    *     ASC) — the decreasing heuristic of the bin-packing literature
    *     (Johnson 1973).
    *   - placement: `bestFit = false` is next-fit (append to the one
    *     open bin, open a new one when the doc doesn't fit — O(1)
    *     state); `bestFit = true` keeps every open bin and places each
    *     doc into the bin with the SMALLEST remainder that still fits
    *     (lowest bin index on ties) — with the decreasing order this
    *     is best-fit-decreasing, the classic ≤ 11/9·OPT + 1 policy,
    *     which backfills early bins with the small tail (the
    *     `t_pack_bfd` gate measures the fill recovered vs arrival
    *     next-fit on the same corpus).
    *
    * Scale shape: ONE exchange keyed by the salted-hash shard, then a
    * linear per-shard fold. The fold is inherently sequential (each
    * placement conditions the next bin state), so this is the
    * documented `mapPartitions` exception: shards are the parallel
    * unit, rows stream through — no buffering of documents, no window,
    * no driver round trip. State per shard: O(1) for next-fit; one
    * (remainder, bin) tree entry PER OPEN BIN for best-fit — ~16 bytes
    * per bin, i.e. bounded by the shard's packed OUTPUT size over
    * `budget`, so shard count sizes both the parallelism and the
    * packer state. Deterministic: (salt, shards, budget, policy) fully
    * determine the layout under any cluster or partitioning, and both
    * folds replay in SQL as recursive CTEs (the gate oracle does,
    * list-state for best-fit).
    *
    * A null/NON-POSITIVE token count raises with the value
    * ([[packedLayout]] discipline — stricter here: packedLayout lets a
    * zero-token doc occupy its start sequence, but an aligned layout
    * would hand a zero-token doc a full bin's remainder-0 slot and emit
    * `bin_offset == budget`, i.e. a `doc_starts` entry OUTSIDE the
    * [0, budget) range attention-mask builders expect — so zero is an
    * input error for bins). A document LARGER than the budget also
    * raises — a non-spanning layout cannot place it, and silently
    * overflowing a bin would corrupt the loss mask downstream. */
  def binLayout(df: DataFrame, idCol: String, tokensCol: String,
      budget: Long, shards: Int = 64, salt: String = "pack",
      decreasing: Boolean = false, bestFit: Boolean = false): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(shards > 0, s"shards must be positive, got $shards")
    val tokens = col(tokensCol).cast(LongType)
    val guarded = when(tokens.isNull || tokens < 1 || tokens > budget,
      raise_error(concat(lit("binLayout: token count "),
        coalesce(tokens.cast("string"), lit("null")),
        lit(s" outside [1, budget=$budget] — documents must fit a " +
          "sequence whole, and a zero-token document has nothing to " +
          "place"))).cast(LongType))
      .otherwise(tokens)
    val prepared = df
      .withColumn("__shard", Sampling.hash32(col(idCol), salt) % shards)
      .withColumn("__t", guarded)
    val order =
      if (decreasing) Seq(col("__t").desc, col(idCol).asc)
      else Seq(col(idCol).asc)
    val ordered = prepared
      .repartition(shards, col("__shard"))
      .sortWithinPartitions(col("__shard").asc +: order: _*)
    val outSchema = ordered.schema
      .add("bin", LongType).add("bin_offset", LongType)
    val shardIdx = ordered.schema.fieldIndex("__shard")
    val tIdx = ordered.schema.fieldIndex("__t")
    val placed = ordered.mapPartitions { it =>
      // multiple shards may hash into one partition; the sort keys the
      // fold by shard, so state resets on every shard change
      var curShard = Long.MinValue
      var bin = -1L
      var rem = 0L
      // best-fit state: (remainder, bin) per open bin; minAfter((t, …))
      // is "smallest remainder ≥ t, lowest bin on ties" in O(log bins)
      val open = scala.collection.mutable.TreeSet.empty[(Long, Long)]
      var nextBin = 0L
      it.map { r =>
        val sh = r.getLong(shardIdx)
        val t = r.getLong(tIdx)
        if (sh != curShard) {
          curShard = sh; bin = -1L; rem = 0L; open.clear(); nextBin = 0L
        }
        if (bestFit) {
          val (b, off) = open.minAfter((t, Long.MinValue)) match {
            case Some(e @ (r0, idx)) =>
              open.remove(e); open.add((r0 - t, idx))
              (idx, budget - r0)
            case None =>
              val idx = nextBin; nextBin += 1
              open.add((budget - t, idx))
              (idx, 0L)
          }
          Row.fromSeq(r.toSeq :+ b :+ off)
        } else {
          if (bin < 0 || t > rem) { bin += 1; rem = budget }
          val off = budget - rem
          rem -= t
          Row.fromSeq(r.toSeq :+ bin :+ off)
        }
      }
    }(Encoders.row(outSchema))
    placed.select(col(idCol), col("__shard").as("shard"),
      col("bin"), col("bin_offset"))
  }

  /** MATERIALIZE the training sequences from a [[binLayout]] placement
    * and a token-id column — the last step before the artifact write:
    * one row per (shard, bin) with `input_ids` = the bin's documents'
    * ids concatenated in placement order and right-padded with `padId`
    * to exactly `budget`, `n_tokens` = the real token count (the
    * attention/loss mask is positions [0, n_tokens)), and `n_docs`.
    *
    * Input contract: `placed` carries `shard`, `bin`, `bin_offset` and
    * `idsCol` (array<int>), with the layout computed over the SAME id
    * counts (`binLayout(…, tokensCol = size(ids))`): a bin whose ids
    * overflow `budget` RAISES in-plan naming (shard, bin) — silent
    * truncation would corrupt the loss mask, the error means layout
    * and ids went out of sync.
    *
    * Scale shape: ONE groupBy (shard, bin) whose per-group payload is
    * ≤ budget ids BY THE LAYOUT CONTRACT (documents never cross bins),
    * so the collect_list is bounded like the broadcast-model collects;
    * in-bin order reconstructs from `bin_offset` (distinct within a
    * bin by construction). No other shuffle; the output is
    * sequence-sized rows ready for [[graft.sinks.Sinks.writeShards]].
    *
    * `doc_starts` carries each document's first-token offset within
    * the sequence (ascending) — the boundary list a trainer needs to
    * mask cross-document attention inside a packed sequence. */
  def emitAligned(placed: DataFrame, idsCol: String, budget: Long,
      padId: Int = 0, lossStartCol: Option[String] = None): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    lossStartCol.foreach(c => require(placed.columns.contains(c),
      s"emitAligned: no '$c' column for the loss boundaries"))
    val raw = flatten(transform(
      sort_array(collect_list(struct(col("bin_offset"), col(idsCol)))),
      d => d.getField(idsCol)))
    // per-sequence LOSS boundaries (SFT artifacts): each document's
    // in-sequence mask start = bin_offset + its token-level loss_start
    // — the aligned layout is what makes this exact (documents never
    // cross bins). Paired with doc_starts: mask [doc_starts_k,
    // loss_bounds_k) per document, train on the rest of its span.
    val lossAgg = lossStartCol.map(c =>
      transform(
        sort_array(collect_list(struct(col("bin_offset"),
          (col("bin_offset") + col(c).cast(LongType)).as("__lb")))),
        e => e.getField("__lb")).as("loss_bounds"))
    placed.groupBy(col("shard"), col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        (Seq(raw.as("__raw"),
          sort_array(collect_list(col("bin_offset"))).as("doc_starts"))
          ++ lossAgg.toSeq): _*)
      .withColumn("n_tokens",
        when(size(col("__raw")) > budget,
          raise_error(concat(lit("emitAligned: shard "),
            col("shard").cast("string"), lit(" bin "),
            col("bin").cast("string"), lit(" holds "),
            size(col("__raw")).cast("string"),
            lit(s" tokens > budget $budget — layout and ids out of sync")))
            .cast("int"))
          .otherwise(size(col("__raw"))))
      .withColumn("input_ids",
        concat(col("__raw"),
          array_repeat(lit(padId),
            (lit(budget).cast("int") - col("n_tokens")))))
      .select((Seq(col("shard"), col("bin"), col("n_docs"),
        col("n_tokens"), col("input_ids"), col("doc_starts")) ++
        lossStartCol.map(_ => col("loss_bounds"))): _*)
  }

  /** MATERIALIZE the GPT-style PRETRAINING sequences from a
    * [[packedLayout]] placement and a token-id column — documents SPAN
    * sequence boundaries, so each document first explodes into its
    * per-sequence PORTIONS (a narrow `slice` per covered sequence:
    * `before = seq_first·budget + seq_offset` reconstructs the
    * document's absolute token range), then one (shard, seq) aggregate
    * concatenates portions in position order. Output per (shard, seq):
    * `input_ids` right-padded with `padId` to `budget` (every sequence
    * is FULL except each shard's tail — `n_tokens` marks the
    * boundary), `n_docs` = documents touching the sequence, and
    * `doc_starts` = in-sequence offsets where a NEW document begins
    * (continuation portions excluded) — the reset points for
    * cross-document attention masking.
    *
    * Contract: the layout must be computed over the SAME counts
    * (`packedLayout(…, tokensCol = size(ids))`). Zero-token documents
    * occupy no positions and emit no portions. Scale shape: narrow
    * explode bounded by each document's sequence span, then ONE
    * (shard, seq) aggregate whose payload is ≤ budget ids by
    * construction — the same two-exchange budget as the layout
    * itself. */
  /** `position_ids` for an emitted sequence — the third artifact column
    * a trainer consumes next to `input_ids` and the attention resets:
    * positions count 0,1,2,… within each document span, restarting at
    * every `doc_starts` offset; padding positions (≥ `nTokens`) are 0.
    * A sequence that BEGINS mid-document (spanning layout) restarts its
    * continuation segment at 0 too — the standard packed-pretraining
    * approximation. [[positionIdsExact]] removes it: [[emitPacked]]
    * emits the continuation's true in-document offset
    * (`first_doc_offset`), and the exact form adds it to the leading
    * segment's positions. The aligned layout never has continuation
    * segments, so there this form IS exact.
    *
    * Pure narrow expression over (doc_starts, n_tokens): O(budget ·
    * docs-per-sequence) per row, zero shuffles at any scale. */
  def positionIds(docStarts: Column, nTokens: Column,
      budget: Long): Column =
    positionIdsExact(docStarts, lit(0L), nTokens, budget)

  /** EXACT `position_ids` for a spanning-layout sequence (r13): the
    * segment before the first doc_start is a mid-document CONTINUATION
    * whose true offset is `firstDocOffset` ([[emitPacked]]'s
    * `first_doc_offset` column — 0 when a document starts at position
    * 0), so its positions count firstDocOffset, firstDocOffset+1, …
    * instead of restarting at 0; every later segment starts a fresh
    * document and restarts exactly as before. Same pure narrow shape. */
  def positionIdsExact(docStarts: Column, firstDocOffset: Column,
      nTokens: Column, budget: Long): Column = {
    require(budget > 0, s"budget must be positive, got $budget")
    val starts = array_union(array(lit(0L)),
      transform(coalesce(docStarts, array().cast("array<int>")),
        s => s.cast(LongType)))
    transform(sequence(lit(0L), lit(budget - 1L)), i => {
      val seg = array_max(filter(starts, s => s <= i))
      when(i >= nTokens.cast(LongType), lit(0L))
        .otherwise(i - seg +
          when(seg === 0L, firstDocOffset.cast(LongType))
            .otherwise(lit(0L)))
        .cast("int")
    })
  }

  /** The `labels` column of an SFT artifact sequence — input_ids with
    * every NON-TRAINED position replaced by `ignoreId` (the -100
    * convention every trainer's cross-entropy ignores): positions
    * inside a document's masked prefix `[doc_starts_k, loss_bounds_k)`
    * and padding positions (≥ nTokens). Pure narrow expression over
    * the emitted arrays — zero shuffles at any scale. */
  def sftLabels(inputIds: Column, docStarts: Column, lossBounds: Column,
      nTokens: Column, ignoreId: Int = -100): Column = {
    val zs = arrays_zip(
      transform(docStarts, s => s.cast(LongType)).as("s"),
      transform(lossBounds, b => b.cast(LongType)).as("b"))
    transform(inputIds, (id, i) =>
      when(i.cast(LongType) >= nTokens.cast(LongType), lit(ignoreId))
        .when(exists(zs, e =>
          i.cast(LongType) >= e.getField("s") &&
            i.cast(LongType) < e.getField("b")), lit(ignoreId))
        .otherwise(id))
  }

  def emitPacked(placed: DataFrame, idsCol: String, budget: Long,
      padId: Int = 0): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val n = size(col(idsCol)).cast(LongType)
    val parts = placed
      .withColumn("__n", n)
      .filter(col("__n") > 0)
      .withColumn("__before",
        col("seq_first") * budget + col("seq_offset"))
      .select(col("shard"), col(idsCol), col("__n"), col("__before"),
        explode(sequence(col("seq_first"), col("seq_last"))).as("seq"))
      .withColumn("__s", greatest(col("seq") * budget, col("__before")))
      .withColumn("__e", least((col("seq") + 1) * budget,
        col("__before") + col("__n")))
      .withColumn("__portion", slice(col(idsCol),
        (col("__s") - col("__before") + 1).cast("int"),
        (col("__e") - col("__s")).cast("int")))
    parts.groupBy(col("shard"), col("seq"))
      .agg(count(lit(1)).as("n_docs"),
        flatten(transform(
          sort_array(collect_list(struct(col("__s"), col("__portion")))),
          p => p.getField("__portion"))).as("__raw"),
        sort_array(collect_list(
          when(col("__s") === col("__before"),
            col("__s") - col("seq") * budget))).as("doc_starts"),
        // the leading segment's TRUE in-document offset: a sequence
        // that begins mid-document opens with the portion whose
        // document started `seq·budget − before` tokens ago; 0 when a
        // new document sits at position 0. The layout already knows
        // this — emitting it is what makes positionIdsExact exact.
        greatest(lit(0L),
          lit(1L) * col("seq") * budget - min(col("__before")))
          .as("first_doc_offset"))
      .withColumn("n_tokens", size(col("__raw")))
      .withColumn("input_ids",
        concat(col("__raw"), array_repeat(lit(padId),
          lit(budget).cast("int") - col("n_tokens"))))
      .select(col("shard"), col("seq"), col("n_docs"), col("n_tokens"),
        col("input_ids"), col("doc_starts"), col("first_doc_offset"))
  }

  /** LENGTH-BUCKETED batching — the inference/eval-side counterpart of
    * the training layouts: fixed ROW-COUNT batches of length-sorted
    * documents, so every batch pads to its own (local) max instead of
    * the corpus max — the "dynamic batching" every serving stack and
    * SFT eval loop applies. Adds `(batch, batch_pos, batch_max,
    * pad_waste)` per row: batch = 0-based ⌊(rank−1)/batchSize⌋ under
    * the TOTAL order (tokens ASC, id ASC), `batch_max` the batch's
    * longest row, `pad_waste = batch_max − tokens` (the padding this
    * row would carry).
    *
    * 100 TB design: the global length rank is the range-partitioned
    * [[Ordinals]] form (sample-based range exchange + per-partition
    * offsets — no single-partition window); batch stats are one keyed
    * aggregate over batch ids, broadcast back by a keyed join on the
    * batch id (batches ≪ rows). A null/negative token count raises
    * in-plan ([[packedLayout]] discipline). */
  def lengthBatches(df: DataFrame, idCol: String, tokensCol: String,
      batchSize: Int): DataFrame = {
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    Seq("batch", "batch_pos", "batch_max", "pad_waste", "__rank").foreach {
      c => require(!df.columns.contains(c),
        s"input already has a '$c' column — rename it before batching")
    }
    val tokens = col(tokensCol).cast(LongType)
    val guarded = when(tokens.isNull || tokens < 0,
      raise_error(concat(lit("lengthBatches: bad token count "),
        coalesce(tokens.cast("string"), lit("null")))).cast(LongType))
      .otherwise(tokens)
    val ranked = Ordinals.withGlobalOrdinal(
      df.withColumn("__t", guarded), "__rank",
      Seq(col("__t").asc, col(idCol).asc))
      .withColumn("batch",
        expr(s"(__rank - 1L) div ${batchSize}L")) // `div`: exact at any magnitude
      .withColumn("batch_pos",
        ((col("__rank") - 1L) % lit(batchSize.toLong)).cast("int"))
    val stats = ranked.groupBy(col("batch"))
      .agg(max(col("__t")).as("batch_max"))
    ranked.join(stats, "batch")
      .withColumn("pad_waste", col("batch_max") - col("__t"))
      .drop("__rank", "__t")
  }
}
