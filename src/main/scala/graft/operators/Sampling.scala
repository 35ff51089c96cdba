package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic dataset splitting / sampling for training pipelines.
  *
  * A training corpus needs train/val/test membership that is (a) stable
  * across runs, engines, partitionings and cluster sizes, (b) a pure
  * narrow map — no shuffle, no global sort, no sampling state, and
  * (c) derivable for any single record in isolation (a record's split
  * never depends on the rest of the corpus, so incremental ingest keeps
  * historical assignments). The standard construction: hash the record
  * id with a salt, bucket the hash, threshold the bucket.
  *
  * The bucket is the first 8 hex digits of md5(id ":" salt) — chosen
  * over xxhash64/Spark `hash` because md5 is bit-identical in every
  * engine (the DuckDB oracle replicates it as
  * `CAST('0x' || SUBSTR(md5(…),1,8) AS BIGINT)`), so assignments are
  * portable, not Spark-private. Salting decorrelates independent splits
  * of the same corpus (split by a different salt for a fresh shuffle).
  */
object Sampling {

  val Buckets = 10000

  /** Bucket in [0, Buckets) from md5(id ":" salt) — deterministic,
    * engine-portable, uniform (md5 avalanche; 8 hex digits = 32 bits
    * ≫ bucket count). A NULL id RAISES: silently routing null ids (all
    * to one split in hashSplit, dropped entirely in hashSample — and no
    * salt ever decorrelates them) corrupts training splits invisibly,
    * so an id-less record is a data bug surfaced at run time. */
  def hashBucket(id: Column, salt: String): Column =
    hash32(id, salt) % Buckets

  /** The raw 32-bit salted hash (first 8 md5 hex digits) behind
    * [[hashBucket]] — take it mod your own range when composing (e.g.
    * [[Packing]] shards) to avoid stacking moduli, which skews any
    * range that doesn't divide [[Buckets]]. */
  def hash32(id: Column, salt: String): Column = {
    val h = conv(substring(
      md5(concat(id.cast(StringType), lit(":"), lit(salt))), 1, 8),
      16, 10).cast(LongType)
    when(id.isNull,
      raise_error(lit("hashBucket: null id — assign ids before splitting"))
        .cast(LongType))
      .otherwise(h)
  }

  /** Add a split-label column from cumulative fraction thresholds, e.g.
    * `Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)`. Fractions must
    * sum to 1 (± rounding); thresholds resolve at 1/Buckets granularity.
    * Narrow map: the plan is scan → project, shuffle-free at any scale. */
  def hashSplit(df: DataFrame, idCol: String, salt: String,
      splits: Seq[(String, Double)], name: String = "split"): DataFrame = {
    require(splits.nonEmpty, "need at least one split")
    val total = splits.map(_._2).sum
    require(math.abs(total - 1.0) < 1e-9,
      s"split fractions must sum to 1, got $total")
    val b = hashBucket(col(idCol), salt)
    val cuts = splits.scanLeft(0L) { case (acc, (_, f)) =>
      acc + math.round(f * Buckets)
    }.tail
    val labeled = splits.map(_._1).zip(cuts).dropRight(1)
      .foldRight(lit(splits.last._1)) { case ((label, cut), rest) =>
        when(b < cut, label).otherwise(rest)
      }
    df.withColumn(name, labeled)
  }

  /** Deterministic `fraction` sample: keeps ids whose bucket falls below
    * the threshold. Monotone in `fraction` for a fixed salt —
    * `hashSample(df, id, s, 0.5)` is a SUBSET of
    * `hashSample(df, id, s, 0.8)` — so growing a sample never churns
    * previously selected records. */
  def hashSample(df: DataFrame, idCol: String, salt: String,
      fraction: Double): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"bad fraction $fraction")
    df.filter(hashBucket(col(idCol), salt) <
      math.round(fraction * Buckets))
  }

  /** Deterministic STRATIFIED sample — the domain-mixing primitive: each
    * stratum (language, source, quality band …) keeps its own fraction,
    * e.g. `Map("en" -> 1.0, "de" -> 0.5)`, so a training mix is a pure
    * function of (id, salt, fractions) — re-runnable, engine-portable,
    * and monotone per stratum like [[hashSample]]. Strata not in the map
    * fall back to `default`. Still a narrow map: the per-row threshold
    * is a literal CASE over the stratum column; no shuffle, no
    * per-stratum scan. */
  /** Domain-mix rebalancing: derive the per-stratum keep-rates that
    * move the corpus to the TARGET proportions by downsampling only —
    * the largest achievable dataset with exactly that mix. With
    * C = min over strata of (n_s / t_s), stratum s keeps
    * rate_s = C·t_s / n_s (= 1 for the binding stratum); strata absent
    * from `targets` drop, and every TARGET stratum must be present in
    * the frame (an absent one raises in-plan — the mix would otherwise
    * silently renormalize over the present strata). This closes the
    * loop the mix-report gate opens: measure actual proportions, then
    * sample to the prescribed ones.
    *
    * Rates are derived IN-PLAN from a per-stratum count aggregate (the
    * stratum cardinality is bounded by contract — domains, not rows —
    * so the cut frame broadcasts), quantized to the same 10k hash
    * buckets as [[stratifiedSample]] via floor(r·10⁴ + ½), and applied
    * with the same salted-md5 bucket — deterministic under any
    * partitioning and replayable by a SQL engine end to end. */
  def rebalance(df: DataFrame, idCol: String, salt: String,
      stratumCol: String, targets: Map[String, Double]): DataFrame =
    rebalanceWeighted(df, idCol, salt, stratumCol, lit(1L), targets)

  /** [[rebalance]] with per-row mass: the target mix is hit over the
    * SUM of `weightCol` per stratum (token or char budgets — the unit a
    * training run actually allocates), not the document count. The
    * keep-decision stays per-row (salted hash < stratum cut), so each
    * stratum retains rate·mass in hash-expectation; a null or
    * non-positive weight raises in-plan (it would silently corrupt the
    * budget). Same single count-aggregate + broadcast-cut shape.
    *
    * Fractional weights are summed in the column's NATIVE type and cast
    * to long once after aggregation — the oracle's
    * `CAST(SUM(w) AS BIGINT)` shape — never truncated per row (a
    * stratum of sub-1.0 weights would otherwise sum to 0 mass and be
    * silently dropped). A stratum whose total mass still rounds to
    * zero raises in-plan: its keep-rate would be undefined and the mix
    * would silently renormalize over the others. */
  def rebalanceByWeight(df: DataFrame, idCol: String, salt: String,
      stratumCol: String, weightCol: String,
      targets: Map[String, Double]): DataFrame = {
    val w = col(weightCol)
    val checked = when(w.isNull || w <= 0,
      raise_error(concat(lit(s"rebalanceByWeight: bad $weightCol "),
        coalesce(w.cast(StringType), lit("null")),
        lit(" — weigh rows before mixing")))
        .cast(df.schema(weightCol).dataType))
      .otherwise(w)
    rebalanceWeighted(df, idCol, salt, stratumCol, checked, targets)
  }

  private def rebalanceWeighted(df: DataFrame, idCol: String, salt: String,
      stratumCol: String, mass: Column,
      targets: Map[String, Double]): DataFrame = {
    require(targets.nonEmpty, "rebalance needs at least one target")
    targets.values.foreach(t =>
      require(t > 0.0, s"target proportions must be > 0, got $t"))
    val spark = df.sparkSession
    val tgtDf = spark.createDataFrame(targets.toSeq.sortBy(_._1))
      .toDF("__st", "__t")
    // sum in the native weight type, cast ONCE after aggregation (the
    // oracle's CAST(SUM(w) AS BIGINT)): casting per row truncates every
    // fractional weight to 0 and can silently drop a whole stratum
    val cnt = df.groupBy(col(stratumCol).as("__st"))
      .agg(sum(mass).cast("long").as("__nraw"))
      .withColumn("__n", when(col("__nraw") <= 0,
        raise_error(concat(lit("rebalance: stratum "),
          col("__st").cast("string"),
          lit(" has non-positive total mass after the long cast — " +
            "use a weight unit whose stratum totals are >= 1")))
          .cast("long"))
        .otherwise(col("__nraw")))
      .drop("__nraw")
    val j = cnt.join(tgtDf, "__st")
    // every listed stratum must exist in the frame: the inner join
    // would otherwise silently DROP absent targets and the kept mix
    // would be the targets renormalized over the present strata, not
    // the listed percentages — fail in-plan (no extra job) instead
    val cap = j.agg(min(col("__n") / col("__t")).as("__cap"),
      count(lit(1)).as("__nst"))
    val capChecked = when(col("__nst") < lit(targets.size),
      raise_error(concat(
        lit("rebalance: only "), col("__nst").cast("string"),
        lit(s" of ${targets.size} target strata present in the frame" +
          " — the kept mix would silently renormalize"))))
      .otherwise(col("__cap"))
    val cut = j.crossJoin(broadcast(cap))
      .withColumn("__cut",
        floor(least(capChecked * col("__t") / col("__n"), lit(1.0)) *
          lit(Buckets) + lit(0.5)).cast("long"))
      .select(col("__st"), col("__cut"))
    df.join(broadcast(cut), df(stratumCol) === col("__st"))
      .filter(hashBucket(col(idCol), salt) < col("__cut"))
      .drop("__st", "__cut")
  }

  /** Deterministic global training-order shuffle: 1-based `shuffle_pos`
    * following (salted-md5 hash of the id, id) — a reproducible
    * decorrelated read order for training shards, the same salt-keyed
    * discipline as [[split]]/[[sampleByHash]] (change the salt, get an
    * independent epoch order).
    *
    * The position comes from [[Ordinals.withGlobalOrdinal]]'s
    * range-exchange numbering — no single-partition window anywhere, so
    * the order materializes at any scale; write the result partitioned
    * by `shuffle_pos` ranges and the shard files ARE the shuffled
    * epoch. Ties on the 32-bit hash (expected at billions of rows)
    * break by id, keeping the order total and replayable. */
  def shuffleOrder(df: DataFrame, idCol: String, salt: String,
      numPartitions: Int = 0): DataFrame =
    Ordinals.withGlobalOrdinal(
      df.withColumn("__sh", hash32(col(idCol), salt)),
      "shuffle_pos", Seq(col("__sh"), col(idCol)), numPartitions)
      .drop("__sh")

  /** Balanced contiguous shard placement over an epoch order — the
    * step between [[shuffleOrder]] and the training artifact
    * ([[graft.sinks.Sinks.writeShards]]): rows carrying the 1-based
    * global position `posCol` (shuffle_pos) are cut into `numShards`
    * CONTIGUOUS blocks whose sizes differ by at most one, so every
    * data-loader worker streams one block of the shuffled epoch
    * sequentially. Adds `shard` (0-based) and `pos_in_shard`
    * (1-based): with n total rows,
    * `shard = (pos−1)·S div n` and
    * `pos_in_shard = pos − (shard·n + S − 1) div S`
    * — pure integer arithmetic, identical in any engine.
    *
    * 100 TB shape: the total count derives IN-PLAN (one count
    * aggregate broadcast into a narrow projection — no driver round
    * trip, no window), so the placement composes into the same job as
    * the shard write; `writeShards(placed, path, "shard",
    * "pos_in_shard")` then does its single range exchange and the
    * shard files ARE the epoch blocks. Deterministic: a pure function
    * of (posCol, n, numShards).
    *
    * `posCol` must be the dense 1..n ordinal [[shuffleOrder]] emits —
    * a null, non-positive, or >n position RAISES in-plan (it would
    * silently place rows into a phantom shard). */
  def epochShards(df: DataFrame, posCol: String, numShards: Int): DataFrame = {
    require(numShards > 0, s"epochShards: need numShards > 0, got $numShards")
    val n = df.agg(count(lit(1)).as("__n"))
    val p = col(posCol).cast(LongType)
    // the raise carries the offending position and the bound: at scale a
    // one-in-a-billion bad row must be debuggable from the message alone
    val checked = when(p.isNull || p < 1 || p > col("__n"),
      raise_error(concat(lit(s"epochShards: $posCol "),
        coalesce(p.cast(StringType), lit("null")),
        lit(" out of [1, "), col("__n").cast(StringType),
        lit("] — use shuffleOrder's dense ordinal"))).cast(LongType))
      .otherwise(p)
    df.crossJoin(broadcast(n))
      .withColumn("__p", checked)
      .withColumn("shard",
        expr(s"(__p - 1L) * ${numShards}L div __n"))
      .withColumn("pos_in_shard",
        expr(s"__p - (shard * __n + ${numShards - 1}L) div ${numShards}L"))
      .drop("__n", "__p")
  }

  /** Deterministic fractional stratum UPSAMPLING — the half of mixture
    * building [[rebalance]] cannot do (it only cuts): production
    * training mixes repeat high-quality domains for more than one
    * epoch (factor 2.5 = every doc appears twice, half the docs a
    * third time — the per-dataset "epochs elapsed when training"
    * weighting of Brown et al. 2020, "Language Models are Few-Shot
    * Learners", Table 2.2, where Wikipedia runs 3.4 epochs while
    * Common Crawl runs 0.44). Each row in stratum
    * s emits ⌊f_s⌋ replicas plus one more iff its salted hash bucket
    * falls below the fractional remainder, so the stratum's expected
    * mass scales by exactly f_s; factor < 1 subsumes downsampling
    * (zero base copies) and factor 0 drops the stratum. Replicas
    * carry 0-based `repCol` — downstream epoch machinery must key on
    * (id, rep) or shuffle positions collide ([[shuffleOrder]] ties).
    *
    * Factors quantize to 1e-4 DRIVER-side (f1e4 = round(f·10⁴),
    * base = f1e4 div 10⁴, cut = f1e4 mod 10⁴), so the per-row
    * decision is pure integer arithmetic against the same
    * [[Buckets]]-bucket salted md5 as [[hashSplit]] — deterministic
    * under any partitioning, engine-portable, replayable in SQL as
    * `unnest(range(base + (hash < cut)))`.
    *
    * 100 TB shape: a narrow map — literal CASE over the stratum
    * column, explode of a ≤(base+1)-element sequence; no shuffle, no
    * aggregate, no state, and therefore STREAM-safe in append mode
    * (upsample at ingest). Output row count is the planned
    * Σ f_s·|s| — the budget arithmetic that picks the factors is
    * [[epochPlan]]'s job. */
  def upsampleByFactor(df: DataFrame, idCol: String, salt: String,
      stratumCol: String, factors: Map[String, Double],
      default: Double = 1.0, repCol: String = "rep"): DataFrame = {
    require(factors.nonEmpty, "upsample needs at least one factor")
    (default +: factors.values.toSeq).foreach(f =>
      require(f >= 0.0 && f <= 1000.0,
        s"upsample factor out of [0, 1000]: $f"))
    def f1e4(f: Double): Long = math.round(f * Buckets)
    def litCase(part: Long => Long): Column =
      factors.toSeq.sortBy(_._1).foldRight(
        lit(part(f1e4(default)))) { case ((s, f), rest) =>
        when(col(stratumCol) === s, lit(part(f1e4(f)))).otherwise(rest)
      }
    val base = litCase(_ / Buckets)
    val cut = litCase(_ % Buckets)
    val n = (base + when(hashBucket(col(idCol), salt) < cut, 1L)
      .otherwise(0L)).cast(IntegerType)
    df.withColumn("__nrep", n)
      .withColumn(repCol, explode(when(col("__nrep") > 0,
        sequence(lit(0), col("__nrep") - 1))
        .otherwise(array().cast("array<int>"))))
      .drop("__nrep")
  }

  /** Token-budget mixture plan — the arithmetic that turns "train on
    * B tokens at mix t̂" into [[upsampleByFactor]] factors: with m_s
    * the stratum's total `weightCol` mass, stratum s must contribute
    * B·t_s tokens, i.e. repeat for factor_s = B·t_s / m_s epochs.
    * Returns the per-stratum plan frame (stratumCol, mass,
    * factor1e4) with factor1e4 = ⌊B·t_s/m_s·10⁴ + ½⌋ — the exact
    * fixed point [[upsampleByFactor]] quantizes to, so plan →
    * upsample loses nothing ([[epochPlanFactors]] bridges them).
    *
    * Targets must sum to 1 (the [[hashSplit]] contract — normalizing
    * here would sum doubles in arbitrary order and break oracle
    * replay); every target stratum must be present with positive
    * mass, or the plan RAISES in-plan (the [[rebalance]] discipline:
    * an absent stratum would silently shift its share onto the rest).
    *
    * 100 TB shape: one (stratum, mass) aggregate joined to the
    * broadcast ≤k-row target list — k is domain cardinality by
    * contract, so the plan frame is driver-safe to collect. */
  def epochPlan(df: DataFrame, stratumCol: String, weightCol: String,
      targets: Map[String, Double], budget: Long): DataFrame = {
    require(targets.nonEmpty, "epochPlan needs at least one target")
    require(budget > 0, s"epochPlan: need budget > 0, got $budget")
    targets.values.foreach(t =>
      require(t > 0.0, s"target proportions must be > 0, got $t"))
    val total = targets.values.sum
    require(math.abs(total - 1.0) < 1e-9,
      s"target proportions must sum to 1, got $total")
    val spark = df.sparkSession
    val tgtDf = spark.createDataFrame(targets.toSeq.sortBy(_._1))
      .toDF("__st", "__t")
    // a null or non-positive weight would silently vanish from the
    // stratum mass (SUM skips nulls) and overstate every factor — the
    // same corruption rebalanceByWeight guards against; raise in-plan
    val w = col(weightCol)
    val wChecked = when(w.isNull || w <= 0,
      raise_error(lit(s"epochPlan: null or non-positive $weightCol — " +
        "weigh rows before planning"))
        .cast(df.schema(weightCol).dataType))
      .otherwise(w)
    // the stratum mass aggregates in the weight column's NATIVE type and
    // feeds the factor arithmetic UNTRUNCATED — casting the sum to long
    // first (the display shape) would silently overstate every repeat
    // factor for fractional weight columns (a double score used as the
    // budget unit); only the reported `mass` column rounds
    val cnt = df.groupBy(col(stratumCol).as("__st"))
      .agg(sum(wChecked).as("__msum"))
    val massType = cnt.schema("__msum").dataType
    val j = cnt.join(broadcast(tgtDf), "__st")
    // absent or massless target strata fail in-plan, never renormalize
    val nst = j.agg(count(lit(1)).as("__nst"))
    val mChecked = when(col("__msum") <= 0,
      raise_error(concat(lit("epochPlan: stratum "),
        col("__st").cast("string"),
        lit(" has non-positive total mass — weigh rows before planning")))
        .cast(massType))
      .otherwise(col("__msum"))
    j.crossJoin(broadcast(nst))
      .withColumn("__mok", when(col("__nst") < lit(targets.size),
        raise_error(concat(
          lit("epochPlan: only "), col("__nst").cast("string"),
          lit(s" of ${targets.size} target strata present in the frame")))
          .cast(massType))
        .otherwise(mChecked))
      .select(col("__st").as(stratumCol),
        col("__mok").cast("long").as("mass"),
        floor(lit(budget) * col("__t") / col("__mok") * lit(Buckets) +
          lit(0.5)).cast("long").as("factor1e4"))
  }

  /** The ≤k-row [[epochPlan]] frame as [[upsampleByFactor]] factors
    * (k = domain cardinality by the plan contract — driver-bounded).
    * factor1e4/10⁴ round-trips exactly through upsample's
    * round(f·10⁴) quantization. */
  def epochPlanFactors(plan: DataFrame, stratumCol: String)
      : Map[String, Double] = {
    val rows = plan
      .select(col(stratumCol).cast(StringType), col("factor1e4"))
      .collect() // ≤ stratum-cardinality rows by the epochPlan contract
    // an EMPTY input frame yields an empty aggregate, so epochPlan's
    // in-plan absent-stratum raise never fires — fail here with the
    // real cause instead of upsampleByFactor's unrelated
    // "needs at least one factor" much later
    if (rows.isEmpty)
      throw new IllegalStateException(
        "epochPlanFactors: no target strata present — empty plan " +
          "(was the input frame empty?)")
    rows.map(r => r.getString(0) -> r.getLong(1) / Buckets.toDouble).toMap
  }

  /** Curriculum training order (Bengio et al. 2009, "Curriculum
    * Learning"): epoch positions ordered by quality BAND — a global
    * NTILE over `scoreCol`, the coarse easy→hard progression — with a
    * salted decorrelated shuffle INSIDE each band (annealing wants
    * graded difficulty, not a global quality sort that would feed the
    * model near-identical neighbors back to back). The output column
    * is `shuffle_pos`, the same dense 1..n ordinal contract as
    * [[shuffleOrder]], so [[epochShards]] / the `shards` statement
    * compose unchanged — the FIRST shards hold the lowest band. The
    * `band` column (1-based) survives for mix review.
    *
    * Low score = early. To anneal hardest-first, pass
    * `ascending = false`. Change the salt for an independent in-band
    * order next epoch.
    *
    * 100 TB shape: two range-exchange ordinal passes
    * ([[Ordinals.withGlobalNtile]] + [[Ordinals.withGlobalOrdinal]] —
    * no single-partition window anywhere); ties break by (hash, id),
    * total and engine-replayable (SQL NTILE + ROW_NUMBER). */
  def curriculumOrder(df: DataFrame, idCol: String, salt: String,
      scoreCol: String, bands: Int, ascending: Boolean = true,
      numPartitions: Int = 0): DataFrame = {
    require(bands > 0, s"curriculumOrder: need bands > 0, got $bands")
    // a null score would sort into band 1 silently (and engines
    // disagree on null placement — Spark NULLS FIRST, SQL NULLS LAST):
    // an unscored row is a data bug, surface it
    val sc = when(col(scoreCol).isNull,
      raise_error(lit(s"curriculumOrder: null $scoreCol — score rows " +
        "before ordering")).cast(df.schema(scoreCol).dataType))
      .otherwise(col(scoreCol))
    val s = if (ascending) sc.asc else sc.desc
    val banded = Ordinals.withGlobalNtile(df, "band", bands,
      Seq(s, col(idCol).asc), numPartitions)
    Ordinals.withGlobalOrdinal(
      banded.withColumn("__sh", hash32(col(idCol), salt)),
      "shuffle_pos", Seq(col("band").asc, col("__sh"), col(idCol)),
      numPartitions)
      .drop("__sh")
  }

  /** TEMPERATURE-2 domain mix — the `p_s ∝ n_s^(1/T)` reweighting
    * multilingual/multi-domain pretraining applies so rare domains are
    * not drowned by head domains (Devlin et al. 2019 appendix;
    * Conneau/Lample's exponentiated-smoothing sampling), at the
    * canonical T = 2: kept mass per stratum ∝ √n_s. Downsample-only
    * (the [[rebalance]] discipline): the rarest stratum keeps 100% and
    * every other stratum keeps rate √(n_min/n_s) — the largest
    * deterministic subsample with the √-mix, no row duplication.
    *
    * EXACT integer decision — no pow/sqrt floats to replay: keep iff
    * `bucket² · n_s < Buckets² · n_min`, which is algebraically
    * `bucket/Buckets < √(n_min/n_s)` with both sides squared. bucket <
    * 10⁴ and n_s ≤ ~10⁹ keep `bucket²·n_s` inside a BIGINT, so a SQL
    * oracle replays the cut bit-for-bit with zero floating point.
    *
    * Plan shape: ONE per-stratum count aggregate (strata are domains,
    * bounded by contract — the counts frame broadcasts), then a
    * zero-shuffle narrow filter. Deterministic under any partitioning
    * and stable under reruns with the same salt. */
  def temperatureSample(df: DataFrame, idCol: String, salt: String,
      stratumCol: String): DataFrame = {
    // a null stratum would silently vanish through the equi-join below
    // (null never equals __st) — raise instead, the null-id discipline
    // of hash32: an unlabeled row is a data bug, not a sampling choice
    val st = when(col(stratumCol).isNull,
      raise_error(lit(s"temperatureSample: null $stratumCol — label " +
        "every row before mixing (null strata are not samplable)"))
        .cast(df.schema(stratumCol).dataType))
      .otherwise(col(stratumCol))
    val cnt = df.groupBy(st.as("__st"))
      .agg(count(lit(1)).as("__n"))
    val nMin = cnt.agg(min(col("__n")).as("__nmin"))
    val b = hashBucket(col(idCol), salt)
    df.join(broadcast(cnt), col(stratumCol) === col("__st"))
      .crossJoin(broadcast(nMin))
      .filter(b * b * col("__n") <
        lit(Buckets.toLong * Buckets) * col("__nmin"))
      .drop("__st", "__n", "__nmin")
  }

  def stratifiedSample(df: DataFrame, idCol: String, salt: String,
      stratumCol: String, fractions: Map[String, Double],
      default: Double = 0.0): DataFrame = {
    (default +: fractions.values.toSeq).foreach(f =>
      require(f >= 0.0 && f <= 1.0, s"bad fraction $f"))
    val cut = fractions.foldLeft(lit(math.round(default * Buckets))) {
      case (rest, (stratum, f)) =>
        when(col(stratumCol) === stratum, lit(math.round(f * Buckets)))
          .otherwise(rest)
    }
    df.filter(hashBucket(col(idCol), salt) < cut)
  }
}
