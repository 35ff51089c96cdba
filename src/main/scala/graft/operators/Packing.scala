package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
}
