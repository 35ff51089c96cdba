package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** T5-style span corruption (Raffel et al. 2020 §3.1.4) — the
  * denoising-objective artifact next to the CLM packing, SFT and DPO
  * emitters: mask token spans, replace each masked run with a sentinel
  * in the INPUT, and emit `sentinel + original tokens` runs as the
  * TARGET.
  *
  * Deterministic reconstruction: position `i` of a document STARTS a
  * span when `hash32(doc:i, salt) % rateK == 0` (expected mask mass ≈
  * 2/rateK with mean span 2), and that span's length is
  * `hash32(doc:i, salt:len) % 3 + 1` — the salted-md5 recipe every
  * split/sample operator here uses, so the mask layout is
  * partitioning- and engine-stable and a SQL oracle replays it
  * token for token. Overlapping spans merge into one run (one
  * sentinel). Deviation from T5 noted: no trailing final sentinel is
  * appended to the target.
  *
  * 100 TB design: a document's corruption depends only on its own id
  * and tokens — ONE narrow map, zero shuffles at any scale. The
  * per-position hashes and the mask are built as whole arrays and
  * folded via a single `aggregate` over the ZIPPED (token, mask)
  * array — no `element_at` into a derived array inside a lambda (that
  * inlines the array builder per element and turns the pass
  * quadratic). */
object SpanCorrupt {

  private val MaxSpan = 3

  /** The FIM sentinels as RESERVED special tokens (r13): pass to the
    * byte-BPE ids encode so `<PRE>/<SUF>/<MID>` are single dedicated
    * ids — see [[Sft.Specials]] for the discipline. */
  val FimSpecials: Seq[String] = Seq("<PRE>", "<SUF>", "<MID>")

  /** The first `n` T5 mask sentinels (`<extra_id_0>`…) as a specials
    * list for [[corrupt]]'s outputs — reserve at least as many as the
    * largest per-document masked-run count (`n_masked`'s max). */
  def extraIdSpecials(n: Int): Seq[String] = {
    require(n >= 1, s"extraIdSpecials needs n >= 1, got $n")
    (0 until n).map(k => s"<extra_id_$k>")
  }

  /** Add `inp` (tokens with masked runs replaced by `<extra_id_k>`),
    * `tgt` (per run: sentinel + the masked tokens), and `n_masked`.
    * Null text stays null.
    *
    * The per-row pipeline is ONE native compiled pass
    * ([[graft.functions.SpanCorruptExpr]] — two md5s per position plus
    * linear assembly); [[corruptSpec]] keeps the Catalyst-HOF fold as
    * the executable semantic specification (measured ~9.5 s vs ~1 s at
    * sf0.1 — interpreted `aggregate` re-concatenates its accumulator
    * arrays per element), with parity pinned in SpanCorruptSpec. */
  def corrupt(df: DataFrame, idCol: String, textCol: String,
      rateK: Int = 6, salt: String = "span"): DataFrame = {
    require(rateK >= 2, s"rateK must be >= 2, got $rateK")
    Seq("inp", "tgt", "n_masked").foreach { c =>
      require(!df.columns.contains(c),
        s"frame already has a '$c' column — rename it before corrupt")
    }
    val toks = Decontaminate.tokens(col(textCol))
    val sc = graft.functions.SpanCorruptExpr.span_corrupt(
      col(idCol).cast("string"), toks, rateK, salt)
    // layout-decoupled: the corruption pass is a per-row compiled fold
    // and must not inherit a row-group-capped scan (guide §2.5; no-op
    // on an already-split input)
    graft.PlanAudit.repartitionIfLayoutBound(df)
      .withColumn("__sc", when(col(textCol).isNotNull, sc))
      .withColumn("inp", col("__sc.inp"))
      .withColumn("tgt", col("__sc.tgt"))
      .withColumn("n_masked",
        when(col("__sc").isNotNull, col("__sc.nm").cast("long")))
      .drop("__sc")
  }

  /** The Catalyst-HOF executable SPECIFICATION of [[corrupt]] —
    * identical output (SpanCorruptSpec pins it), kept as the
    * SQL-shaped reference the gate oracle mirrors. */
  def corruptSpec(df: DataFrame, idCol: String, textCol: String,
      rateK: Int = 6, salt: String = "span"): DataFrame = {
    require(rateK >= 2, s"rateK must be >= 2, got $rateK")
    Seq("inp", "tgt", "n_masked").foreach { c =>
      require(!df.columns.contains(c),
        s"frame already has a '$c' column — rename it before corrupt")
    }
    val id = col(idCol)
    val toks = filter(Decontaminate.tokens(col(textCol)),
      w => length(w) > 0)
    val n = size(toks)
    def posKey(i: Column) =
      concat(id.cast("string"), lit(":"), i.cast("string"))
    // empty token list → empty position list (sequence(1, 0) is
    // invalid; an empty doc must produce empty inp/tgt, not a phantom
    // position)
    val posSeq = when(n >= 1, sequence(lit(1), n))
      .otherwise(array().cast("array<int>"))
    val starts = transform(posSeq,
      i => Sampling.hash32(posKey(i), salt) % rateK === 0)
    val lens = transform(posSeq,
      i => (Sampling.hash32(posKey(i), salt + ":len") % MaxSpan + 1)
        .cast("int"))
    // masked(i) ⟺ a span starting at i, i-1 or i-2 still covers i;
    // shifts via array prepends, never element_at-in-lambda
    def shift(a: Column, by: Int, fill: Column) =
      // prepend then cut to length n — an empty array must stay empty
      // (a fixed-size filler prefix would desynchronize the zips)
      slice(concat(array((1 to by).map(_ => fill): _*), a),
        lit(1), greatest(n, lit(0)))
    val z = arrays_zip(
      starts.as("s0"), lens.as("l0"),
      shift(starts, 1, lit(false)).as("s1"), shift(lens, 1, lit(0)).as("l1"),
      shift(starts, 2, lit(false)).as("s2"), shift(lens, 2, lit(0)).as("l2"))
    val masked = transform(z, e =>
      (e.getField("s0") && e.getField("l0") >= 1) ||
        (e.getField("s1") && e.getField("l1") >= 2) ||
        (e.getField("s2") && e.getField("l2") >= 3))
    // one linear fold over (token, mask): state carries the built
    // input/target arrays, the sentinel counter and the previous mask
    val folded = aggregate(
      arrays_zip(toks.as("t"), masked.as("m")),
      struct(
        array().cast("array<string>").as("inp"),
        array().cast("array<string>").as("tgt"),
        lit(-1).as("k"), lit(false).as("prev"), lit(0).as("nm")),
      (st, e) => {
        val t = e.getField("t"); val m = e.getField("m")
        val k1 = st.getField("k") + 1
        val sent = (k: Column) =>
          concat(lit("<extra_id_"), k.cast("string"), lit(">"))
        when(!m, struct(
          concat(st.getField("inp"), array(t)).as("inp"),
          st.getField("tgt").as("tgt"),
          st.getField("k").as("k"), lit(false).as("prev"),
          st.getField("nm").as("nm")))
          .when(m && !st.getField("prev"), struct(
            concat(st.getField("inp"), array(sent(k1))).as("inp"),
            concat(st.getField("tgt"), array(sent(k1)), array(t)).as("tgt"),
            k1.as("k"), lit(true).as("prev"),
            (st.getField("nm") + 1).as("nm")))
          .otherwise(struct(
            st.getField("inp").as("inp"),
            concat(st.getField("tgt"), array(t)).as("tgt"),
            st.getField("k").as("k"), lit(true).as("prev"),
            (st.getField("nm") + 1).as("nm")))
      },
      st => st)
    df.withColumn("__sc", when(col(textCol).isNotNull, folded))
      .withColumn("inp", array_join(col("__sc.inp"), " "))
      .withColumn("tgt", array_join(col("__sc.tgt"), " "))
      .withColumn("n_masked",
        when(col("__sc").isNotNull, col("__sc.nm").cast("long")))
      .drop("__sc")
  }

  /** FILL-IN-THE-MIDDLE transform (Bavarian et al. 2022, "Efficient
    * Training of Language Models to Fill in the Middle") — the
    * infilling-objective sibling of [[corrupt]]: a deterministic
    * fimPermille of documents are reordered PSM
    * (`<PRE> prefix <SUF> suffix <MID> middle`) so the model learns to
    * infill conditioned on both sides; the rest pass through verbatim
    * (the paper's mixed objective). The two cut points are salted-md5
    * draws over [0, n] (lo = min, hi = max) — partitioning- and
    * engine-stable, a SQL oracle replays every token boundary.
    *
    * Adds `fim` (the transformed token stream), `fim_applied`, and
    * `n_tokens`; null text stays null. 100 TB design: a document's
    * transform depends only on its own id and tokens — ONE narrow map,
    * zero shuffles at any scale. */
  def fim(df: DataFrame, idCol: String, textCol: String,
      fimPermille: Int = 900, salt: String = "fim"): DataFrame = {
    require(fimPermille >= 0 && fimPermille <= 1000,
      s"fimPermille must be in [0, 1000], got $fimPermille")
    Seq("fim", "fim_applied", "n_tokens").foreach { c =>
      require(!df.columns.contains(c),
        s"frame already has a '$c' column — rename it before fim")
    }
    val id = col(idCol)
    val toks = filter(Decontaminate.tokens(col(textCol)),
      w => length(w) > 0)
    val n = size(toks)
    // 10k buckets like every sampling cut; the two cut draws use
    // DISTINCT salts off the same id (the SpanCorrupt posKey recipe)
    val applied = Sampling.hashBucket(id, salt) <
      lit(fimPermille.toLong * 10)
    val cutA = Sampling.hash32(id, salt + ":a") % (n.cast("long") + 1L)
    val cutB = Sampling.hash32(id, salt + ":b") % (n.cast("long") + 1L)
    val lo = least(cutA, cutB).cast("int")
    val hi = greatest(cutA, cutB).cast("int")
    // slice(arr, start, length): 1-based start — empty slices are
    // length-0, never negative
    val prefix = slice(toks, lit(1), lo)
    val middle = slice(toks, lo + 1, hi - lo)
    val suffix = slice(toks, hi + 1, n - hi)
    val psm = concat_ws(" ",
      concat(array(lit("<PRE>")), prefix,
        array(lit("<SUF>")), suffix,
        array(lit("<MID>")), middle))
    graft.PlanAudit.repartitionIfLayoutBound(df)
      .withColumn("fim",
        when(col(textCol).isNull, lit(null).cast("string"))
          .when(applied, psm)
          .otherwise(concat_ws(" ", toks)))
      .withColumn("fim_applied",
        when(col(textCol).isNotNull, applied))
      .withColumn("n_tokens",
        when(col(textCol).isNotNull, n.cast("long")))
  }
}
