package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Salted equi-join — the manual skew breaker for the case AQE can't
  * fix and broadcast can't reach: a fact table where a handful of keys
  * dominate (the classic 100 TB failure mode: one hot key lands a whole
  * shuffle partition on one executor) joined to a dimension that is too
  * large to broadcast.
  *
  * The fact side gets a deterministic salt in [0, salts) hashed from a
  * per-row column set; the dimension side is exploded `salts` times (one
  * copy per salt value); the join key becomes (key, salt). A hot key's
  * rows now spread over `salts` shuffle partitions. Each fact row meets
  * exactly the one dimension copy carrying its salt, so the output is
  * row-for-row the plain inner join — proved by the j4 gate's oracle,
  * which IS the unsalted SQL join.
  *
  * The salt is hashed from row content, NOT rand(): retried/speculated
  * tasks re-derive identical salts, so the operator is idempotent under
  * Spark's execution model (a rand() salt is also correct but makes
  * stage retries produce different partition layouts — miserable to
  * debug). Cost: dimension shuffle volume × salts. Prefer broadcast when
  * the dimension fits, and AQE skew-join when plain sort-merge is
  * acceptable; this is the tool for the gap between them.
  */
object SkewJoin {

  /** Inner-join `fact` to `dim` on fact(factKey) == dim(dimKey), salted
    * `salts` ways. `saltSource` must be non-null per row (any unique-ish
    * row identity: primary key columns, a struct of them, …). Output
    * columns: every fact column, then every dim column except dimKey.
    */
  def salted(fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String,
      salts: Int, saltSource: Column): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    require(!fact.columns.contains("__salt") &&
      !dim.columns.contains("__salt"), "__salt is reserved")
    val f = fact.withColumn("__salt",
      pmod(xxhash64(saltSource), lit(salts.toLong)).cast(IntegerType))
    val x = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    f.join(x, f(factKey) === x(dimKey) && f("__salt") === x("__salt"),
        "inner")
      .select(fact.columns.toIndexedSeq.map(f(_)) ++
        dim.columns.filterNot(_ == dimKey).map(x(_)): _*)
  }
}
