package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WordPiece tokenizer (the BERT family: Schuster & Nakajima 2012; Wu
  * et al. 2016 §4.1) — the second production tokenizer family next to
  * [[Bpe]]. Same merge-table machinery, two deliberate differences:
  *
  *   - TRAINING ranks candidate pairs by the likelihood ratio
  *     `count(l,r) / (count(l)·count(r))` instead of raw pair count —
  *     a pair merges when its parts co-occur more than chance, so rare
  *     but exclusive pairs beat frequent-by-accident ones. Scores are
  *     fixed-point integers (`c_pair·1e6 div (c_l·c_r)`) under the
  *     total order (score DESC, pair count DESC, left ASC, right ASC),
  *     so a SQL oracle replays every round bit-for-bit.
  *   - ENCODING is greedy longest-match-first against the final
  *     vocabulary (not merge replay): at each position take the
  *     longest vocabulary piece, `##`-prefixed off word start; a word
  *     with an unmatchable remainder encodes as one `[UNK]`.
  *
  * Symbols follow the BERT convention: the word-initial piece is bare,
  * every continuation piece carries the `##` prefix ("cat" →
  * `c ##a ##t`; merging (`c`,`##a`) yields `ca`).
  *
  * 100 TB design: the corpus is touched ONCE (the word-count frame —
  * Heap's-law-bounded distinct words); each training round is two
  * bounded aggregates (pair counts + unit counts) and one driver row.
  * Encoding is ONE native compiled pass per document
  * ([[graft.functions.WordPieceEncodeExpr]] — hash-set membership, the
  * BpeEncodeExpr recipe): a pure narrow map, zero shuffles,
  * vocabulary-size-independent probes, stream-safe. The Column-fold
  * form ([[encodeWord]]) stays as the executable specification the
  * parity test pins the native pass against.
  */
object WordPiece {

  final case class Merge(rank: Int, left: String, right: String,
      scoreFp: Long) {
    /** BERT join rule: the right part drops its continuation marker. */
    def merged: String = left + right.stripPrefix("##")
  }

  val Unk = "[UNK]"
  private val ScoreScale = 1000000L

  // substring(Column, Column, Column) has no functions._ overload
  private def substring(str: Column, pos: Column, len: Column): Column =
    call_function("substring", str, pos, len)

  /** A word as WordPiece symbols: first char bare, rest `##`-prefixed. */
  private def pieceSyms(word: Column): Column =
    transform(sequence(lit(1), length(word)),
      i => when(i === 1, substring(word, i, lit(1)))
        .otherwise(concat(lit("##"), substring(word, i, lit(1)))))

  /** Distinct lowercase whitespace words with frequencies and initial
    * symbol spellings — the only corpus pass of the trainer. Layout-
    * decoupled ([[graft.PlanAudit.repartitionIfLayoutBound]]): the
    * tokenize/explode map work runs before the groupBy shuffle and must
    * not inherit a row-group-capped scan (the r14 3.6–8.6× finding). */
  private def wordFrame(df0: DataFrame, textCol: String): DataFrame = {
    val df = graft.PlanAudit.repartitionIfLayoutBound(df0)
    df.select(explode(Decontaminate.tokens(col(textCol))).as("__w"))
      .filter(length(col("__w")) > 0)
      .groupBy(col("__w")).agg(count(lit(1)).as("__f"))
      .select(col("__w"), col("__f"), pieceSyms(col("__w")).as("__syms"))
  }

  /** One greedy left-to-right merge pass emitting `merged` for each
    * non-overlapping adjacent (left, right) — [[Bpe.applyMerge]]'s
    * carry fold with the WordPiece join rule. */
  private def applyMergeAs(syms: Column, left: String, right: String,
      merged: String): Column = {
    val init = struct(
      array().cast("array<string>").as("out"),
      lit(null).cast("string").as("carry"))
    aggregate(syms, init,
      (acc, x) => {
        val out = acc.getField("out")
        val carry = acc.getField("carry")
        when(carry.isNull, struct(out.as("out"), x.as("carry")))
          .when(carry === lit(left) && x === lit(right),
            struct(concat(out, array(lit(merged))).as("out"),
              lit(null).cast("string").as("carry")))
          .otherwise(struct(concat(out, array(carry)).as("out"),
            x.as("carry")))
      },
      acc => {
        val out = acc.getField("out")
        val carry = acc.getField("carry")
        when(carry.isNull, out).otherwise(concat(out, array(carry)))
      })
  }

  /** Train `nMerges` likelihood-ranked merges. Each round: pair counts
    * and unit counts (two bounded aggregates with map-side combine),
    * one `limit(1).collect()` driver row, one narrow merge pass with
    * lineage truncated per round (the [[Bpe.fit]] localCheckpoint
    * discipline). Stops early when no pair reaches `minCount`. */
  def fit(df: DataFrame, textCol: String, nMerges: Int,
      minCount: Long = 2L): Seq[Merge] = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    require(minCount >= 1L, s"minCount must be >= 1, got $minCount")
    var vocab = wordFrame(df, textCol).localCheckpoint(true)
    val merges = Seq.newBuilder[Merge]
    var rank = 1
    var done = false
    while (rank <= nMerges && !done) {
      val n = size(col("__syms"))
      val pairs = vocab
        .select(col("__f"), explode(arrays_zip(
          slice(col("__syms"), lit(1), greatest(n - 1, lit(0))).as("__l"),
          slice(col("__syms"), lit(2), greatest(n - 1, lit(0))).as("__r")))
          .as("__p"))
        .groupBy(col("__p.__l").as("__l"), col("__p.__r").as("__r"))
        .agg(sum(col("__f")).as("__c"))
      val units = vocab
        .select(col("__f"), explode(col("__syms")).as("__u"))
        .groupBy(col("__u")).agg(sum(col("__f")).as("__uc"))
      val best = pairs
        .join(units.select(col("__u").as("__l"), col("__uc").as("__lc")),
          "__l")
        .join(units.select(col("__u").as("__r"), col("__uc").as("__rc")),
          "__r")
        .select(col("__l"), col("__r"), col("__c"),
          expr(s"(__c * $ScoreScale) div (__lc * __rc)").as("__s"))
        .orderBy(col("__s").desc, col("__c").desc, col("__l").asc,
          col("__r").asc)
        .limit(1).collect() // exactly one row per round — bounded
      best.headOption.filter(_.getAs[Long]("__c") >= minCount) match {
        case None => done = true
        case Some(row) =>
          val m = Merge(rank, row.getAs[String]("__l"),
            row.getAs[String]("__r"), row.getAs[Long]("__s"))
          merges += m
          vocab = vocab.select(col("__w"), col("__f"),
            applyMergeAs(col("__syms"), m.left, m.right, m.merged)
              .as("__syms"))
            .localCheckpoint(true)
          rank += 1
      }
    }
    merges.result()
  }

  /** PRODUCTION-SCALE fit — the [[Bpe.fitLocal]] split applied to the
    * likelihood trainer: a real BERT vocabulary is ~30k pieces, and
    * [[fit]] pays two aggregates + one collect + one checkpoint PER
    * MERGE (~60k sequential Spark jobs — hours of driver round trips).
    * Here the corpus is touched exactly once, distributed (the same
    * (word, freq) aggregate), and the merge loop runs in driver memory
    * over the collected Heap's-law-bounded word frame — the split every
    * real tokenizer trainer uses. `maxWords` caps the collect by
    * contract (top words by (freq DESC, word ASC) — deterministic
    * frequency truncation, the standard trainer knob).
    *
    * The in-memory loop maintains pair counts AND unit counts so the
    * likelihood score `(pc·1e6) div (uc_l·uc_r)` replays [[fit]]'s
    * fixed-point arithmetic exactly, under the same total order
    * (score DESC, pair count DESC, left ASC, right ASC). Unlike the
    * raw-count BPE heap, a merge moves the score of every pair sharing
    * a unit with (left, right, merged) — so next to the pair→words
    * occurrence index the loop keeps a unit→pairs index and re-pushes
    * fresh heap entries for every pair whose pc OR endpoint uc changed;
    * lazy deletion validates both components at pop. IDENTICAL merge
    * list to [[fit]] whenever the corpus has ≤ `maxWords` distinct
    * words (WordPieceSpec pins the property); SCALE.md carries the
    * measured ≥1k-merge wall-clock. */
  def fitLocal(df: DataFrame, textCol: String, nMerges: Int,
      minCount: Long = 2L, maxWords: Int = 1 << 20): Seq[Merge] =
    fitLocalFromFrame(wordFrame(df, textCol), nMerges, minCount, maxWords)

  /** [[fitLocal]] + [[vocabulary]] over ONE word-frame pass (r17, guide
    * §6 scan reuse): every fit-then-encode consumer previously built
    * `wordFrame` twice — once for the merge trainer's truncated
    * collect, once for the alphabet collect — i.e. two full
    * tokenize+explode+aggregate passes over the corpus. The frame is
    * persisted for the two bounded collects and released; results are
    * bit-identical (same frame, same collects). */
  def fitLocalWithVocab(df: DataFrame, textCol: String, nMerges: Int,
      minCount: Long = 2L,
      maxWords: Int = 1 << 20): (Seq[Merge], Seq[String]) = {
    val wf = wordFrame(df, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val merges = fitLocalFromFrame(wf, nMerges, minCount, maxWords)
      val chars = wf.select(explode(col("__syms")).as("__u"))
        .distinct().collect().map(_.getString(0)) // alphabet-bounded
      (merges, (chars.toSeq ++ merges.map(_.merged)).distinct.sorted)
    } finally wf.unpersist(false)
  }

  private def fitLocalFromFrame(wf: DataFrame, nMerges: Int,
      minCount: Long, maxWords: Int): Seq[Merge] = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    require(minCount >= 1L, s"minCount must be >= 1, got $minCount")
    require(maxWords >= 1, s"maxWords must be >= 1, got $maxWords")
    val collected = wf.select(col("__w"), col("__f"))
      .orderBy(col("__f").desc, col("__w").asc)
      .limit(maxWords)
      .collect() // ≤ maxWords rows BY CONSTRUCTION — the trainer knob
    // truncation is a silent oracle-divergence risk above the knob —
    // warn once so it is diagnosable at production scale (ADVICE r15)
    if (collected.length == maxWords)
      Console.err.println(
        s"[graft] WARN wordpiece-fit-truncated: corpus has > $maxWords " +
          s"distinct words — fitLocal kept the top $maxWords by " +
          "(freq DESC, word ASC); merges may diverge from an untruncated " +
          "fit (raise maxWords to cover the corpus)")
    val words = new Array[Array[String]](collected.length)
    val freqs = new Array[Long](collected.length)
    var wi = 0
    while (wi < collected.length) {
      val w = collected(wi).getString(0)
      // WordPiece spelling, split per CODE POINT (pieceSyms uses Spark
      // substring — code-point units): first bare, rest ##-prefixed
      val syms = Seq.newBuilder[String]
      var ci = 0
      while (ci < w.length) {
        val cp = w.codePointAt(ci)
        val l = Character.charCount(cp)
        val c = w.substring(ci, ci + l)
        syms += (if (ci == 0) c else "##" + c)
        ci += l
      }
      words(wi) = syms.result().toArray
      freqs(wi) = collected(wi).getLong(1)
      wi += 1
    }
    fitInMemory(words, freqs, nMerges, minCount)
  }

  /** The in-memory indexed likelihood trainer behind [[fitLocal]]. */
  private def fitInMemory(words: Array[Array[String]], freqs: Array[Long],
      nMerges: Int, minCount: Long): Seq[Merge] = {
    import scala.collection.mutable
    val counts = mutable.HashMap.empty[(String, String), Long]
    val units = mutable.HashMap.empty[String, Long]
    val occ = mutable.HashMap.empty[(String, String), mutable.HashSet[Int]]
    // unit → pairs currently containing it on either side: the index
    // that finds every pair whose SCORE moved because a merge changed
    // an endpoint's unit count (pc-unchanged pairs included)
    val byUnit = mutable.HashMap.empty[String,
      mutable.HashSet[(String, String)]]
    // overflow-guarded: at production corpus scale two unit counts of
    // ~1e10 make ul·ur exceed Long (and pc·ScoreScale overflows past
    // pc ~9.2e12), silently corrupting the merge order. When either
    // product leaves the Long range, compute the SAME quotient in
    // BigInt — the result always fits (pc ≤ min(ul, ur), so the score
    // is ≤ ScoreScale), and the fast path is bit-identical to the
    // un-guarded arithmetic in the non-overflow range.
    def score(pc: Long, l: String, r: String): Long = {
      val ul = units.getOrElse(l, 1L)
      val ur = units.getOrElse(r, 1L)
      // fits-in-Long test for positive operands: high word zero AND the
      // low word still positive (a product in [2^63, 2^64) has a zero
      // high word but reads negative)
      if (Math.multiplyHigh(ul, ur) == 0 && ul * ur > 0 &&
          Math.multiplyHigh(pc, ScoreScale) == 0 && pc * ScoreScale >= 0)
        pc * ScoreScale / (ul * ur)
      else
        (BigInt(pc) * ScoreScale / (BigInt(ul) * ur)).toLong
    }
    def addPair(p: (String, String), f: Long, w: Int): Unit = {
      counts(p) = counts.getOrElse(p, 0L) + f
      occ.getOrElseUpdate(p, mutable.HashSet.empty) += w
      byUnit.getOrElseUpdate(p._1, mutable.HashSet.empty) += p
      byUnit.getOrElseUpdate(p._2, mutable.HashSet.empty) += p
    }
    // max-heap under (score DESC, pair count DESC, left ASC, right
    // ASC) — the [[fit]] total order; string comparisons reversed so
    // the lexicographically smallest pair wins. Lazy deletion: a
    // popped entry is live only if BOTH its count and its score match
    // the standing maps (scores move without pc moving when a merge
    // shifts an endpoint's unit count).
    val ord = new Ordering[(Long, Long, String, String)] {
      def compare(a: (Long, Long, String, String),
          b: (Long, Long, String, String)): Int = {
        val s = java.lang.Long.compare(a._1, b._1)
        if (s != 0) s
        else {
          val c = java.lang.Long.compare(a._2, b._2)
          if (c != 0) c
          else {
            val l = b._3.compareTo(a._3)
            if (l != 0) l else b._4.compareTo(a._4)
          }
        }
      }
    }
    val heap = mutable.PriorityQueue.empty[(Long, Long, String, String)](ord)
    var i = 0
    while (i < words.length) {
      val syms = words(i)
      var j = 0
      while (j < syms.length) {
        units(syms(j)) = units.getOrElse(syms(j), 0L) + freqs(i)
        if (j < syms.length - 1) addPair((syms(j), syms(j + 1)), freqs(i), i)
        j += 1
      }
      i += 1
    }
    counts.foreach { case (p, c) => heap.enqueue((score(c, p._1, p._2), c,
      p._1, p._2)) }
    val merges = Seq.newBuilder[Merge]
    var rank = 1
    var done = false
    while (rank <= nMerges && !done) {
      // pop to the first LIVE entry (count AND score match)
      var best: (String, String) = null
      var bestC = 0L
      var bestS = 0L
      while (best == null && heap.nonEmpty) {
        val (s, c, l, r) = heap.dequeue()
        if (counts.getOrElse((l, r), 0L) == c && c > 0 &&
            score(c, l, r) == s) {
          best = (l, r); bestC = c; bestS = s
        }
      }
      if (best == null || bestC < minCount) done = true
      else {
        val (l, r) = best
        val m = Merge(rank, l, r, bestS)
        val mergedSym = m.merged
        val touched = occ.getOrElse(best, mutable.HashSet.empty).toArray
        val changedPairs = mutable.HashSet.empty[(String, String)]
        // NET unit deltas (accumulated across touched words, applied
        // once): only l, r and the merged symbol net-change, so the
        // score re-push fans out over O(pairs sharing those three
        // units), not over every unit of every touched word
        val unitDelta = mutable.HashMap.empty[String, Long]
        def bumpUnit(u: String, d: Long): Unit =
          unitDelta(u) = unitDelta.getOrElse(u, 0L) + d
        var t = 0
        while (t < touched.length) {
          val w = touched(t)
          val old = words(w)
          val f = freqs(w)
          var j = 0
          while (j < old.length) {
            bumpUnit(old(j), -f)
            if (j < old.length - 1) {
              val p = (old(j), old(j + 1))
              counts(p) = counts.getOrElse(p, 0L) - f
              occ.get(p).foreach(_ -= w)
              changedPairs += p
            }
            j += 1
          }
          // the same greedy left-to-right carry pass as applyMergeAs
          val next = Array.newBuilder[String]
          var carry: String = null
          var k = 0
          while (k < old.length) {
            val x = old(k)
            if (carry == null) carry = x
            else if (carry == l && x == r) { next += mergedSym; carry = null }
            else { next += carry; carry = x }
            k += 1
          }
          if (carry != null) next += carry
          val nw = next.result()
          words(w) = nw
          j = 0
          while (j < nw.length) {
            bumpUnit(nw(j), f)
            if (j < nw.length - 1) {
              val p = (nw(j), nw(j + 1))
              addPair(p, f, w)
              changedPairs += p
            }
            j += 1
          }
          t += 1
        }
        // apply the net unit deltas, then re-push every pair sharing a
        // NET-changed unit (their scores moved without their pc moving)
        unitDelta.foreach { case (u, d) =>
          if (d != 0L) {
            units(u) = units.getOrElse(u, 0L) + d
            if (units(u) <= 0L) units.remove(u): Unit
            byUnit.get(u).foreach(ps => changedPairs ++= ps)
          }
        }
        changedPairs.foreach { p =>
          val c = counts.getOrElse(p, 0L)
          if (c <= 0) {
            counts.remove(p); occ.remove(p)
            byUnit.get(p._1).foreach(_ -= p)
            byUnit.get(p._2).foreach(_ -= p)
          } else heap.enqueue((score(c, p._1, p._2), c, p._1, p._2))
        }
        merges += m
        rank += 1
      }
    }
    merges.result()
  }

  /** Persistent fit — the [[Bpe.fitStored]] contract for the WordPiece
    * family: the learned merge list trains ONCE (via the production
    * [[fitLocal]] path), persists as a ≤`nMerges`-row parquet artifact
    * under a [[graft.cache.LineageCache]] content key, and a later
    * SESSION (new JVM, same store root) loads it instead of
    * re-training — piece-id stability across incremental ingest runs.
    * Key hygiene is the caller's: change `wpKey` when the fit corpus is
    * supposed to change; otherwise corpus growth does NOT re-train, by
    * design. */
  def fitStored(df: DataFrame, textCol: String, nMerges: Int,
      minCount: Long, wpKey: String,
      store: graft.cache.LineageCache,
      specials: Seq[String] = Nil): Seq[Merge] = {
    // a specials list changes the FIT CORPUS (tag text excluded from
    // the statistics), so it is part of the artifact key — length-
    // prefixed per special for injectivity (the Bpe.fitStored rule)
    val k = store.key("wordpiece",
      Seq(wpKey, textCol, nMerges.toString, minCount.toString) ++
        specialsKeyPart(specials))
    val fitDf = graft.functions.SpecialTokens
      .segmentedCorpus(df, textCol, specials)
    val mdf = store.getOrCompute(k) {
      val spark = df.sparkSession
      import spark.implicits._
      fitLocal(fitDf, textCol, nMerges, minCount)
        .map(m => (m.rank, m.left, m.right, m.scoreFp))
        .toDF("rank", "left", "right", "score_fp")
    }
    mdf.collect() // ≤ nMerges rows by the fit contract — bounded
      .map(r => Merge(r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3)))
      .sortBy(_.rank).toSeq
  }

  private def specialsKeyPart(specials: Seq[String]): Seq[String] =
    if (specials.isEmpty) Nil
    else Seq("specials",
      specials.map(s => s"${s.length}:$s").mkString(","))

  /** The ENCODER-ready persisted artifact: the final vocabulary
    * (corpus alphabet + merged pieces) under the same store contract as
    * [[fitStored]] — the alphabet scan is itself a corpus pass, so a
    * reload must skip it too for the zero-refit-jobs property
    * (StoredModelSpec pins it). One artifact = one encoder: a session
    * that loads this list encodes identically forever. */
  def vocabularyStored(df: DataFrame, textCol: String, nMerges: Int,
      minCount: Long, wpKey: String,
      store: graft.cache.LineageCache,
      specials: Seq[String] = Nil): Seq[String] = {
    val k = store.key("wordpiece_vocab",
      Seq(wpKey, textCol, nMerges.toString, minCount.toString) ++
        specialsKeyPart(specials))
    val vdf = store.getOrCompute(k) {
      val spark = df.sparkSession
      import spark.implicits._
      // the alphabet scan runs over the same specials-excluded corpus
      // as the merges (a tag's literal characters must not leak in)
      vocabulary(graft.functions.SpecialTokens
          .segmentedCorpus(df, textCol, specials), textCol,
        fitStored(df, textCol, nMerges, minCount, wpKey, store, specials))
        .toDF("piece")
    }
    // alphabet + merges rows by the vocabulary contract — bounded
    vdf.collect().map(_.getString(0)).toSeq.sorted
  }

  /** The final vocabulary for [[fit]]'s merges over `df`: every
    * word-initial and `##`-continuation character of the corpus plus
    * each merge's joined piece. */
  def vocabulary(df: DataFrame, textCol: String,
      merges: Seq[Merge]): Seq[String] = {
    val chars = wordFrame(df, textCol)
      .select(explode(col("__syms")).as("__u"))
      .distinct().collect().map(_.getString(0)) // alphabet-bounded
    (chars.toSeq ++ merges.map(_.merged)).distinct.sorted
  }

  /** The shippable vocab.txt-equivalent table: `(id, piece)` with
    * `[UNK]` at id 0 and the vocabulary in its deterministic sorted
    * order after it — engine- and partitioning-stable, so the artifact
    * a downstream tokenizer loads is reproducible bit-for-bit. */
  def vocabFrame(spark: org.apache.spark.sql.SparkSession,
      vocab: Seq[String]): DataFrame = {
    require(vocab.nonEmpty, "vocabFrame needs a non-empty vocabulary")
    import spark.implicits._
    ((0, Unk) +: vocab.distinct.sorted.zipWithIndex
      .map { case (p, i) => (i + 1, p) }).toDF("id", "piece")
  }

  /** Greedy longest-match piece array for one word column against a
    * literal vocabulary. Word-initial pieces match bare, continuations
    * `##`-prefixed; an unmatchable remainder collapses the word to one
    * `[UNK]`. Pure narrow expression (the per-position candidate probe
    * walks lengths `maxPieceLen..1`). */
  def encodeWord(word: Column, vocab: Seq[String],
      maxPieceLen: Int = 16): Column = {
    require(vocab.nonEmpty, "encodeWord needs a non-empty vocabulary")
    require(maxPieceLen >= 1, s"maxPieceLen must be >= 1, got $maxPieceLen")
    val vocabLit = array(vocab.map(lit): _*)
    // no vocabulary piece is longer than its longest member — probing
    // lengths beyond that is pure wasted membership checks (the fold is
    // interpreted, so the constant matters)
    val effMax = math.min(maxPieceLen,
      vocab.map(p => if (p.startsWith("##")) p.length - 2 else p.length)
        .max.max(1))
    val len = length(word)
    val init = struct(lit(1).as("p"),
      array().cast("array<string>").as("toks"), lit(false).as("bad"))
    val folded = aggregate(sequence(lit(1), greatest(len, lit(1))), init,
      (st, _) => {
        val p = st.getField("p")
        val stDone = st.getField("bad") || p > len
        val hi = least(lit(effMax), len - p + 1)
        val cand = (l: Column) =>
          when(p === 1, substring(word, p, l))
            .otherwise(concat(lit("##"), substring(word, p, l)))
        val matched = filter(sequence(hi, lit(1), lit(-1)),
          l => array_contains(vocabLit, cand(l)))
        val l0 = element_at(matched, 1)
        when(stDone, st)
          .when(size(matched) === 0,
            struct(p.as("p"), st.getField("toks").as("toks"),
              lit(true).as("bad")))
          .otherwise(struct((p + l0).as("p"),
            concat(st.getField("toks"), array(cand(l0))).as("toks"),
            lit(false).as("bad")))
      },
      st => when(st.getField("bad"), array(lit(Unk)))
        .otherwise(st.getField("toks")))
    when(len > 0, folded).otherwise(array().cast("array<string>"))
  }

  /** Per-ROW piece array for a whole text column — ONE native compiled
    * pass ([[graft.functions.WordPieceEncodeExpr]]: hash-set vocabulary,
    * greedy longest-match, `[UNK]` collapse; parity with the
    * [[encodeWord]] fold pinned in WordPieceSpec). A pure narrow map:
    * zero shuffles at any scale, stream-safe. */
  def encodeCol(text: Column, vocab: Seq[String],
      maxPieceLen: Int = 16): Column = {
    require(vocab.nonEmpty, "encodeCol needs a non-empty vocabulary")
    require(maxPieceLen >= 1, s"maxPieceLen must be >= 1, got $maxPieceLen")
    graft.functions.WordPieceEncodeExpr.wp_encode(
      Decontaminate.tokens(text), vocab, maxPieceLen)
  }

  /** The BERT `input_ids` form: the same greedy walk with each piece
    * mapped to its [[vocabFrame]] id (`[UNK]` = 0, sorted vocabulary at
    * 1..N) — the shippable training-artifact column; the
    * t_wordpiece_vocab table is its exact decoder. Pure narrow map. */
  def encodeIdsCol(text: Column, vocab: Seq[String],
      maxPieceLen: Int = 16): Column = {
    require(vocab.nonEmpty, "encodeIdsCol needs a non-empty vocabulary")
    require(maxPieceLen >= 1, s"maxPieceLen must be >= 1, got $maxPieceLen")
    graft.functions.WordPieceEncodeExpr.wp_encode_ids(
      Decontaminate.tokens(text), vocab, maxPieceLen)
  }

  /** [[encodeIdsCol]] with RESERVED special tokens (r13): the text is
    * segmented around special occurrences BEFORE the lowercasing
    * whitespace tokenizer ([[graft.functions.SpecialTokens]] —
    * leftmost-first, longest-match), so a tag like `<|user|>` survives
    * case-exact as ONE dedicated id `N+1+k` (N = vocabulary size;
    * `[UNK]`=0, sorted vocab 1..N — the [[vocabFrame]] layout, specials
    * stacked on top, the HF added_tokens convention). Plain segments
    * encode through the same compiled greedy walk; concatenating the
    * per-element streams in order is the document's id stream. Still a
    * pure narrow map: the split and the per-segment encodes are
    * codegen'd/interpreted in-plan, zero shuffles, stream-safe (the
    * per-document segment count is tag-bounded, so the interpreted
    * HOF shell costs O(segments), not O(tokens)). */
  def encodeIdsCol(text: Column, vocab: Seq[String],
      specials: Seq[String], maxPieceLen: Int): Column = {
    require(vocab.nonEmpty, "encodeIdsCol needs a non-empty vocabulary")
    require(maxPieceLen >= 1, s"maxPieceLen must be >= 1, got $maxPieceLen")
    graft.functions.SpecialTokens.validate(specials)
    val n = vocab.distinct.size
    val parts = graft.functions.SpecialTokens.special_split(text, specials)
    flatten(transform(parts, s =>
      specials.zipWithIndex.foldRight(
        graft.functions.WordPieceEncodeExpr.wp_encode_ids(
          Decontaminate.tokens(s), vocab, maxPieceLen)) {
        case ((sp, k), acc) =>
          when(s === lit(sp), array(lit(n + 1 + k))).otherwise(acc)
      }))
  }

  /** Encode every document: lowercase whitespace words, each replaced
    * by its piece sequence — one narrow [[encodeCol]] pass, zero
    * shuffles (the encode is context-free per word and the inner loop
    * is compiled, so there is nothing to memoize or join). Returns
    * `(idCol, wp, n_pieces)` with `wp` the space-joined piece stream;
    * a doc with no words gets `wp = '' / n_pieces = 0`, null text stays
    * null. */
  def encode(df: DataFrame, idCol: String, textCol: String,
      vocab: Seq[String], maxPieceLen: Int = 16): DataFrame =
    df.select(col(idCol),
        encodeCol(col(textCol), vocab, maxPieceLen).as("__wps"))
      .select(col(idCol),
        array_join(col("__wps"), " ").as("wp"),
        when(col("__wps").isNotNull, size(col("__wps")).cast("long"))
          .as("n_pieces"))
}
