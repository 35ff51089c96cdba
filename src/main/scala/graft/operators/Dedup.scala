package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication operator family — the library surface (gates in
  * graft.queries.SimilarityGates/TextGates wrap these).
  *
  * All near-dup variants return the SURVIVOR set: the input minus rows
  * judged duplicates of a lower-id row. Pair-level output is available
  * via the `*Pairs` forms.
  *
  * Scale design per operator in SCALE.md.
  */
object Dedup {

  /** Signature frames are (a) expensive to compute — Catalyst happily
    * inlines the HOF signature expressions into every reference site,
    * recomputing them per reference (measured 128 copies of the token
    * hashing in the pre-barrier simhash plan) — and (b) referenced twice
    * by the candidate self-joins, which get no ReusedExchange. Caching
    * the tiny signature relation (id + fixed-width signature, a few
    * hundred bytes/row regardless of document size) fixes both: one
    * computation, both join branches read the InMemoryRelation. */
  private def cached(df: DataFrame): DataFrame =
    df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** Normalized-text digest (the exact-dedup identity). */
  def fingerprint(textCol: Column): Column =
    md5(lower(regexp_replace(textCol, "\\s+", " ")))

  /** Exact dedup: one row per distinct normalized text, keeping the
    * minimum id. Shuffles 32-byte digests, never documents. */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(fingerprint(col(textCol)).as("fingerprint"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Distinct word n-gram shingle hashes for a text column. */
  def shingles(textCol: Column, n: Int = 3): Column = {
    val toks = split(lower(textCol), "\\s+")
    array_distinct(
      transform(sequence(lit(0), greatest(size(toks) - n, lit(0))),
        i => xxhash64(concat_ws(" ", slice(toks, i + 1, lit(n))))))
  }

  /** |A∩B| / (|A|+|B|-|A∩B|) — one set operation instead of
    * intersect+union; whole-stage codegen's subexpression elimination
    * computes the intersection once. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast(DoubleType)
    inter / (size(a) + size(b) - inter)
  }

  /** Deterministic minhash permutation parameters. */
  private def perms(numPerms: Int): Seq[(Long, Long)] =
    (0 until numPerms).map { j =>
      val a = 0x9E3779B97F4A7C15L * (2 * j + 1) | 1L
      val b = 0xC2B2AE3D27D4EB4FL * (j + 1)
      (a, b)
    }

  /** MinHash LSH candidate pairs: (idA, idB) with idA < idB that share at
    * least one of `bands` band hashes over a `numPerms`-perm signature.
    * Candidate generation is an equi-join on (band, bandHash). */
  def minhashCandidates(df: DataFrame, textCol: String, idCol: String,
      numPerms: Int = 64, bands: Int = 16): DataFrame = {
    require(numPerms % bands == 0, "bands must divide numPerms")
    val rowsPerBand = numPerms / bands
    val ps = perms(numPerms)
    // cheap pre-filter first (a filter on the shingle column itself
    // would be pushed below the projection, recomputing shingles)
    val sh = cached(df
      .filter(size(split(lower(col(textCol)), "\\s+")) >= 1)
      .select(col(idCol).as("__id"), shingles(col(textCol)).as("__sh")))
    def mh(j: Int): Column = {
      val (a, b) = ps(j)
      array_min(transform(col("__sh"), h => h * lit(a) + lit(b)))
    }
    // bandRows is the expensive frame (64 array_mins per row) and is the
    // self-joined one — cache it, not just sh
    val bandRows = cached(sh.withColumn("__band", explode(array(
      (0 until bands).map(k => struct(lit(k).as("bidx"),
        xxhash64((0 until rowsPerBand).map(r => mh(k * rowsPerBand + r)): _*)
          .as("bhash"))): _*)))
      .select(col("__id"), col("__band.bidx"), col("__band.bhash")))
    bandRows.as("a").join(bandRows.as("b"),
      col("a.bidx") === col("b.bidx") && col("a.bhash") === col("b.bhash")
        && col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"))
      .distinct()
  }

  /** MinHash LSH near-dup survivors: drop the higher id of every candidate
    * pair whose exact shingle Jaccard ≥ threshold. */
  def minhashLsh(df: DataFrame, textCol: String, idCol: String,
      threshold: Double = 0.5, numPerms: Int = 64,
      bands: Int = 16): DataFrame = {
    val sh = cached(df.select(col(idCol).as("__id"),
      shingles(col(textCol)).as("__sh")))
    val drops = minhashCandidates(df, textCol, idCol, numPerms, bands)
      .join(sh.as("sa"), col("id_a") === col("sa.__id"))
      .join(sh.as("sb"), col("id_b") === col("sb.__id"))
      .filter(size(col("sa.__sh")) >= size(col("sb.__sh")) * threshold &&
        size(col("sb.__sh")) >= size(col("sa.__sh")) * threshold &&
        jaccard(col("sa.__sh"), col("sb.__sh")) >= threshold)
      .select(col("id_b").as("__drop")).distinct()
    df.join(drops, col(idCol) === col("__drop"), "left_anti")
  }

  /** 64-bit SimHash signature: per-row bit votes over the distinct token
    * hash set — a narrow map, no explode, no shuffle. */
  def simhash(textCol: Column): Column = {
    val hs = array_distinct(
      transform(split(lower(textCol), "\\s+"), tok => xxhash64(tok)))
    (0 until 64).map { i =>
      val vote = aggregate(hs, lit(0L), (acc, h) =>
        acc + when(h.bitwiseAND(lit(1L << i)) =!= 0, 1L).otherwise(-1L))
      when(vote > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce((x, y) => x.bitwiseOR(y))
  }

  /** SimHash near-dup survivors: hamming distance ≤ maxHamming, candidates
    * via 16-bit chunk banding (pigeonhole-complete for maxHamming ≤ 3 with
    * 4 chunks). */
  def simhashDedup(df: DataFrame, textCol: String, idCol: String,
      maxHamming: Int = 3): DataFrame = {
    // hs must be cached: the 64 vote aggregates each reference it, and
    // Catalyst would inline (recompute) the token hashing per vote
    val hs = cached(df.select(col(idCol).as("__id"), array_distinct(
      transform(split(lower(col(textCol)), "\\s+"),
        tok => xxhash64(tok))).as("__hs")))
    val sim = cached(hs.select(col("__id"), (0 until 64).map { i =>
      val vote = aggregate(col("__hs"), lit(0L), (acc, h) =>
        acc + when(h.bitwiseAND(lit(1L << i)) =!= 0, 1L).otherwise(-1L))
      when(vote > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce((x, y) => x.bitwiseOR(y)).as("__simhash")))
    val chunks = sim.withColumn("__c", explode(array(
      (0 until 4).map(k => struct(lit(k).as("cidx"),
        shiftright(col("__simhash"), 16 * k).bitwiseAND(lit(0xFFFFL))
          .as("chash"))): _*)))
      .select(col("__id"), col("__simhash"), col("__c.cidx"), col("__c.chash"))
    val drops = chunks.as("a").join(chunks.as("b"),
      col("a.cidx") === col("b.cidx") && col("a.chash") === col("b.chash")
        && col("a.__id") < col("b.__id"))
      .filter(bit_count(col("a.__simhash").bitwiseXOR(col("b.__simhash")))
        <= maxHamming)
      .select(col("b.__id").as("__drop")).distinct()
    df.join(drops, col(idCol) === col("__drop"), "left_anti")
  }

  /** Exact n-gram Jaccard survivors, blocked on `blockCols` to bound the
    * quadratic pair space (at open scale, compose with minhashCandidates
    * instead of blocking alone). */
  def ngramJaccard(df: DataFrame, textCol: String, idCol: String,
      blockCols: Seq[String], threshold: Double = 0.6,
      n: Int = 3): DataFrame = {
    val g = cached(df
      .filter(size(split(lower(col(textCol)), "\\s+")) >= 1)
      .select((col(idCol).as("__id") +:
        blockCols.map(col)) :+ shingles(col(textCol), n).as("__g"): _*))
    val cond = blockCols.map(c => col(s"a.$c") === col(s"b.$c"))
      .reduce(_ && _) && col("a.__id") < col("b.__id")
    // size-ratio prune: J(A,B) ≤ min(|A|,|B|)/max(|A|,|B|), so pairs with
    // mismatched set sizes cannot reach the threshold — cheap integer
    // comparisons ahead of the O(|A|+|B|) intersect
    val sizePrune =
      size(col("a.__g")) >= size(col("b.__g")) * threshold &&
        size(col("b.__g")) >= size(col("a.__g")) * threshold
    val drops = g.as("a").join(g.as("b"), cond)
      .filter(sizePrune && jaccard(col("a.__g"), col("b.__g")) >= threshold)
      .select(col("b.__id").as("__drop")).distinct()
    df.join(drops, col(idCol) === col("__drop"), "left_anti")
  }
}
