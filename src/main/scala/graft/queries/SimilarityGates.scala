package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Gate.t

/** Near-duplicate detection + similarity search over `documents` and
  * `embeddings` — the scale-critical training-data-pipeline operators.
  *
  * Design for 100 TB:
  *  - MinHash/SimHash banding turns the O(n²) pair space into an equi-join
  *    on (band, bandHash) — a plain shuffle join Spark can do at any scale;
  *    only banded candidates are verified exactly.
  *  - n-gram Jaccard is blocked on (lang, source) so the quadratic step is
  *    bounded per block.
  *  - Embedding ops compute cosine through exact decimal sums (bit-stable
  *    across engines → SQL-oracle-checkable) and block on `label`
  *    (IVF-style coarse quantization is the unbounded-scale path below).
  */
object SimilarityGates {

  private val dec12 = DecimalType(38, 12)

  /** Deterministic dot product: each per-element double product is scaled
    * by 1e12 and FLOORed to a long (exact — |x·y|·1e12 ≤ ~1e13 < 2^53, and
    * the 64-element sum ≤ ~1e15 < 2^63), summed in integer arithmetic
    * (order-independent), then divided back once. Bit-identical in Spark
    * and DuckDB regardless of accumulation order or decimal rounding mode.
    */
  private def ddot(a: Column, b: Column): Column =
    (aggregate(
      zip_with(a, b, (x, y) =>
        floor(x.cast(DoubleType) * y.cast(DoubleType) * lit(1e12))
          .cast(LongType)),
      lit(0L), (acc, x) => acc + x)
      .cast(DoubleType) / lit(1e12))

  private val ddotSql: (String, String) => String = (a, b) =>
    s"(CAST(list_sum(list_transform(list_zip($a, $b), " +
      s"x -> CAST(FLOOR(CAST(x[1] AS DOUBLE)*CAST(x[2] AS DOUBLE)*1e12) AS BIGINT))) AS DOUBLE) / 1e12)"

  /** documents → (doc_id, lang, source, distinct word-3-gram shingle
    * hashes). Hashing the shingles to longs up front makes every
    * downstream set op (intersect/union/min) integer-cheap. */
  private def shingled(s: SparkSession, d: String): DataFrame = {
    val toks = split(lower(col("text")), "\\s+")
    t(s, d, "documents")
      .withColumn("toks", toks)
      .filter(size(col("toks")) >= 3)
      .withColumn("shingles", array_distinct(
        transform(sequence(lit(0), size(col("toks")) - 3),
          i => xxhash64(concat_ws(" ", slice(col("toks"), i + 1, lit(3)))))))
      .select("doc_id", "lang", "source", "shingles")
  }

  private def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast(DoubleType) / size(array_union(a, b))

  // 64 minhash permutations h -> a*h + b over the shingle-hash set.
  // Odd multipliers from a splitmix-style sequence; wraparound arithmetic
  // is fine (any 2-adic bijection preserves min-hash uniformity).
  private val perms: Seq[(Long, Long)] = (0 until 64).map { j =>
    val a = 0x9E3779B97F4A7C15L * (2 * j + 1) | 1L
    val b = 0xC2B2AE3D27D4EB4FL * (j + 1)
    (a, b)
  }

  val gates: Seq[Gate] = Seq(

    // MinHash + LSH near-dup dedup: shingle → 64-perm minhash signature →
    // 16 bands × 4 rows → band-hash equi-join for candidates → exact
    // Jaccard verify → drop the higher doc_id of each dup pair.
    Gate("d_minhash_lsh", (s, d) => {
      val sh = shingled(s, d).select("doc_id", "shingles")
      // each per-perm min is inlined into exactly one band hash — naming
      // the signature as its own column tempts Catalyst's project
      // collapse into recomputing it per reference (measured 6× slower)
      def mh(j: Int): Column = {
        val (a, b) = perms(j)
        array_min(transform(col("shingles"), h => h * lit(a) + lit(b)))
      }
      val bands = sh.withColumn("band", explode(array(
        (0 until 16).map(k => struct(lit(k).as("bidx"),
          xxhash64(mh(4 * k), mh(4 * k + 1), mh(4 * k + 2), mh(4 * k + 3))
            .as("bhash"))): _*)))
        .select(col("doc_id"), col("band.bidx"), col("band.bhash"))
      val cand = bands.as("a")
        .join(bands.as("b"),
          col("a.bidx") === col("b.bidx") && col("a.bhash") === col("b.bhash")
            && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
        .distinct()
      val verified = cand
        .join(sh.as("sa"), col("id_a") === col("sa.doc_id"))
        .join(sh.as("sb"), col("id_b") === col("sb.doc_id"))
        .filter(jaccard(col("sa.shingles"), col("sb.shingles")) >= 0.5)
        .select(col("id_b").as("drop_id")).distinct()
      t(s, d, "documents")
        .join(verified, col("doc_id") === col("drop_id"), "left_anti")
        .select("doc_id").orderBy(col("doc_id"))
    }, None),

    // SimHash near-dup dedup: 64-bit signature from per-token bit votes
    // (static shifts → whole-stage codegen, map-side combine), 4×16-bit
    // chunk banding (pigeonhole-complete for hamming ≤ 3), verify with
    // bit_count(xor) ≤ 3.
    Gate("d_simhash", (s, d) => {
      // per-row bit votes over the distinct token-hash set: a narrow map
      // with no explode and no shuffle (the explode+groupBy formulation
      // shuffles |tokens| rows per doc — 10× slower at sf0.1)
      val hs = t(s, d, "documents")
        .select(col("doc_id"), array_distinct(
          transform(split(lower(col("text")), "\\s+"),
            tok => xxhash64(tok))).as("hs"))
      val sim = hs.withColumn("simhash",
        (0 until 64).map { i =>
          val vote = aggregate(col("hs"), lit(0L), (acc, h) =>
            acc + when(h.bitwiseAND(lit(1L << i)) =!= 0, 1L).otherwise(-1L))
          when(vote > 0, lit(1L << i)).otherwise(lit(0L))
        }.reduce((x, y) => x.bitwiseOR(y)))
        .select("doc_id", "simhash")
      val chunks = sim.withColumn("c", explode(array(
        (0 until 4).map(k => struct(lit(k).as("cidx"),
          shiftright(col("simhash"), 16 * k).bitwiseAND(lit(0xFFFFL))
            .as("chash"))): _*)))
        .select(col("doc_id"), col("simhash"), col("c.cidx"), col("c.chash"))
      val drops = chunks.as("a")
        .join(chunks.as("b"),
          col("a.cidx") === col("b.cidx") && col("a.chash") === col("b.chash")
            && col("a.doc_id") < col("b.doc_id"))
        .filter(bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))) <= 3)
        .select(col("b.doc_id").as("drop_id")).distinct()
      t(s, d, "documents")
        .join(drops, col("doc_id") === col("drop_id"), "left_anti")
        .select("doc_id").orderBy(col("doc_id"))
    }, None),

    // Exact n-gram Jaccard dedup, blocked on (lang, source) to bound the
    // quadratic pair space per block.
    Gate("d_ngram_jaccard", (s, d) => {
      val g = shingled(s, d).withColumnRenamed("shingles", "grams")
      val drops = g.as("a")
        .join(g.as("b"),
          col("a.lang") === col("b.lang") && col("a.source") === col("b.source")
            && col("a.doc_id") < col("b.doc_id"))
        .filter(jaccard(col("a.grams"), col("b.grams")) >= 0.6)
        .select(col("b.doc_id").as("drop_id")).distinct()
      t(s, d, "documents")
        .join(drops, col("doc_id") === col("drop_id"), "left_anti")
        .select("doc_id").orderBy(col("doc_id"))
    }, None),

    // Embedding-cosine near-dup dedup, blocked on `label`, with a full SQL
    // oracle thanks to the decimal-exact cosine.
    Gate("d_embed_cosine_dup", (s, d) => {
      val e = t(s, d, "embeddings")
        .select(col("vec_id"), col("label"), col("embedding"),
          sqrt(ddot(col("embedding"), col("embedding"))).as("nrm"))
      val drops = e.as("a")
        .join(e.as("b"),
          col("a.label") === col("b.label")
            && col("a.vec_id") < col("b.vec_id"))
        .filter(ddot(col("a.embedding"), col("b.embedding"))
          / (col("a.nrm") * col("b.nrm")) >= 0.95)
        .select(col("b.vec_id").as("drop_id")).distinct()
      e.join(drops, col("vec_id") === col("drop_id"), "left_anti")
        .select("vec_id").orderBy(col("vec_id"))
    },
      Some(s"""WITH e AS (
             |  SELECT vec_id, label, embedding,
             |    SQRT(${ddotSql("embedding", "embedding")}) AS nrm
             |  FROM embeddings)
             |SELECT vec_id FROM e
             |WHERE NOT EXISTS (
             |  SELECT 1 FROM e a
             |  WHERE a.label = e.label AND a.vec_id < e.vec_id
             |    AND ${ddotSql("a.embedding", "e.embedding")} / (a.nrm * e.nrm) >= 0.95)
             |ORDER BY vec_id ASC NULLS FIRST""".stripMargin)),

    // Brute-force cosine top-k (the ANN correctness baseline): queries are
    // vec_id < 5; exact top-10 neighbors each, fully SQL-oracle-checked.
    Gate("s_ann_topk", (s, d) => {
      val e = t(s, d, "embeddings")
        .select(col("vec_id"), col("embedding"),
          sqrt(ddot(col("embedding"), col("embedding"))).as("nrm"))
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"),
          col("embedding").as("qv"), col("nrm").as("qn"))
      val scored = broadcast(q).join(e, col("query_id") =!= col("vec_id"))
        .withColumn("cosine",
          ddot(col("qv"), col("embedding")) / (col("qn") * col("nrm")))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cosine").desc, col("vec_id"))
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 10)
        .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
          col("cosine"))
        .orderBy(col("query_id"), col("rank"))
    },
      Some(s"""WITH e AS (
             |  SELECT vec_id, embedding,
             |    SQRT(${ddotSql("embedding", "embedding")}) AS nrm
             |  FROM embeddings),
             |scored AS (
             |  SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id,
             |    ${ddotSql("q.embedding", "b.embedding")} / (q.nrm * b.nrm) AS cosine
             |  FROM e q JOIN e b ON q.vec_id < 5 AND b.vec_id != q.vec_id),
             |ranked AS (
             |  SELECT query_id, neighbor_id, cosine,
             |    ROW_NUMBER() OVER (PARTITION BY query_id
             |      ORDER BY cosine DESC, neighbor_id) AS rank
             |  FROM scored)
             |SELECT query_id, rank, neighbor_id, cosine FROM ranked
             |WHERE rank <= 10
             |ORDER BY query_id ASC NULLS FIRST, rank ASC NULLS FIRST""".stripMargin)),

    // IVF-style ANN (the scale path): coarse-quantize with KMeans(16)
    // centroids, probe the 4 nearest cells per query, exact cosine within
    // the probed cells only. At 100 TB the cell assignment is the only
    // full scan; probing touches nprobe/ncells of the data.
    Gate("s_ann_ivf", (s, d) => {
      import org.apache.spark.ml.clustering.KMeans
      import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
      val e = t(s, d, "embeddings")
        .select(col("vec_id"),
          transform(col("embedding"), _.cast(DoubleType)).as("v"))
        .withColumn("features", array_to_vector(col("v")))
        .withColumn("nrm", sqrt(ddot(col("v"), col("v"))))
      val km = new KMeans().setK(16).setSeed(42L).setMaxIter(5)
        .setFeaturesCol("features")
      val model = km.fit(e)
      val assigned = model.transform(e)
        .select(col("vec_id"), col("v"), col("nrm"),
          col("prediction").as("cell"))
      val cents = model.clusterCenters.zipWithIndex.map { case (c, i) =>
        (i, c.toArray)
      }.toSeq
      val centDf = s.createDataFrame(cents).toDF("cell", "cv")
        .withColumn("cnrm", sqrt(ddot(col("cv"), col("cv"))))
      // queries → 4 nearest cells by centroid cosine
      val q = assigned.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("v").as("qv"),
          col("nrm").as("qn"))
      val wc = Window.partitionBy(col("query_id"))
        .orderBy(col("ccos").desc, col("cell"))
      val probed = broadcast(q).crossJoin(broadcast(centDf))
        .withColumn("ccos", ddot(col("qv"), col("cv")) / (col("qn") * col("cnrm")))
        .withColumn("crank", row_number().over(wc))
        .filter(col("crank") <= 4)
        .select("query_id", "qv", "qn", "cell")
      val scored = probed.join(assigned,
        probed("cell") === assigned("cell")
          && col("query_id") =!= col("vec_id"))
        .withColumn("cosine", ddot(col("qv"), col("v")) / (col("qn") * col("nrm")))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cosine").desc, col("vec_id"))
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 10)
        .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
          col("cosine"))
        .orderBy(col("query_id"), col("rank"))
    }, None)
  )
}
