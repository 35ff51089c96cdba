package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Deterministic Lloyd's k-means — engine-portable clustering.
  *
  * The reference's `k-means` statement (Accord.MachineLearning k-means,
  * SURVEY §2 A7) and MLlib's KMeans both produce implementation-specific
  * cluster ids (randomized kmeans|| init), which is why `a7_kmeans` spent
  * three rounds as the one SURVEY operator without a value oracle. This
  * variant is k-means with every source of engine dependence pinned:
  *
  *  - init: the k quantile rows of the feature-lexicographic order
  *    (rank ((2j+1)·n)/(2k) + 1, 1-based, unique tie-break) — no RNG;
  *  - assignment: argmin of squared Euclidean distance, lowest cluster id
  *    wins ties (a fixed CASE chain, not a float-order min);
  *  - update: per-cluster mean via exact DECIMAL(30,6) sums cast back to
  *    double (the same trick as queries.Det — bit-identical in any
  *    engine and any accumulation order); empty clusters keep their
  *    previous centroid;
  *  - a FIXED iteration count (no float-tolerance convergence test);
  *  - output ids canonicalized by lexicographic centroid order.
  *
  * Every step is a deterministic function of the input relation, so
  * `oracleSql` can unroll the identical computation as chained SQL CTEs
  * and a DuckDB run hash-matches Spark bit-for-bit — k-means with a full
  * SQL oracle. Reproducibility across engines/versions is also the
  * production win: MLlib's ids are not stable across Spark upgrades, so
  * any pipeline that joins on cluster id silently reshuffles on upgrade;
  * this one re-derives identically anywhere.
  *
  * Scale: fit is `iters`+2 passes — one count, one range-partitioned
  * ordinal scan (operators.Ordinals — no single-partition stage) of which
  * only k quantile rows are collected, then per-iteration a codegen'd
  * narrow-map assignment (centroids are literals, k·d doubles broadcast
  * in the plan itself) feeding a map-side-combined aggregate that returns
  * k rows to the driver. The labeled output is a PURE PROJECTION — no
  * join, no shuffle — so labeling 100 TB costs one narrow pass.
  */
object KMeansDet {

  private val dec6 = DecimalType(30, 6)

  final case class Model(centroids: Array[Array[Double]], perm: Array[Int])

  /** A feature cell the fit/label passes can use: castable to a real
    * double (NULL, non-numeric strings and NaN are all unusable). */
  private def usable(f: Column): Column = f.isNotNull && !isnan(f)

  /** Fit on the non-null feature rows of `df`. `tieBreak` must complete
    * the feature columns to a total order (any unique row id). */
  def fit(df: DataFrame, features: Seq[String], tieBreak: Seq[Column],
      k: Int, iters: Int = 10): Model = {
    // k = 1 is legal (the reference's `k-means (1)` reduces the whole
    // frame to one cluster): init picks the single median row, every
    // iteration computes the global mean, assignExpr degenerates to
    // lit(0) — no special casing needed beyond allowing it here
    require(k >= 1, s"k must be >= 1, got $k")
    require(iters > 0, s"iters must be > 0, got $iters")
    require(features.nonEmpty, "k-means needs at least one feature column")
    val pts = df
      .select(features.map(f => col(f).cast(DoubleType).as(f))
        :+ struct(tieBreak: _*).as("__tb"): _*)
      // post-cast guard: catches nulls, non-castable values AND NaN —
      // a NaN feature would pass isNotNull but vanish from the decimal
      // sum while still counting in count(), silently skewing centroids
      .filter(features.map(f => usable(col(f))).reduce(_ && _))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = pts.count()
      require(n >= k, s"k-means needs at least k=$k rows, got $n")
      val ranks = (0 until k).map(j => ((2L * j + 1) * n) / (2L * k) + 1)
      val order = features.map(col(_).asc) :+ col("__tb").asc
      val initRows = Ordinals.withGlobalOrdinal(pts, "__rn", order)
        .filter(col("__rn").isin(ranks: _*))
        .orderBy("__rn")
        .select(features.map(col): _*)
        .collect()
      var cents = initRows.map(r =>
        features.indices.map(r.getDouble).toArray)
      // the k quantile ranks are distinct for any n >= k, so this only
      // fires on a broken ordinal — but a short centroid array would
      // otherwise surface as an opaque index error in assignExpr
      require(cents.length == k,
        s"init produced ${cents.length} centroids, expected $k")
      for (_ <- 1 to iters) {
        // per-cluster exact-decimal means (queries.Det shape: decimal sum
        // is order-independent, the one decimal→double cast rounds the
        // same everywhere)
        val aggs = features.map { f =>
          (sum(col(f).cast(dec6)).cast(DoubleType) / count(col(f)))
            .as(s"__m_$f")
        }
        val stats = pts
          .groupBy(assignExpr(cents, features).as("__cl"))
          .agg(aggs.head, aggs.tail: _*)
          .collect()
          .map(r => r.getAs[Int]("__cl") ->
            features.map(f => r.getAs[Double](s"__m_$f")).toArray)
          .toMap
        cents = cents.zipWithIndex.map { case (prev, j) =>
          stats.getOrElse(j, prev) // empty cluster keeps its centroid
        }
      }
      // canonical relabel: output id = rank of the centroid in
      // lexicographic order (original id breaks exact-tie centroids)
      val sortedIdx = cents.indices.sortWith { (a, b) =>
        val c = lexCompare(cents(a), cents(b)); if (c != 0) c < 0 else a < b
      }
      val perm = Array.ofDim[Int](k)
      sortedIdx.zipWithIndex.foreach { case (j, rank) => perm(j) = rank }
      Model(cents, perm)
    } finally { pts.unpersist() }
  }

  /** Label `df` with canonical cluster ids: one codegen'd projection,
    * NULL for rows with a null feature. */
  def withCluster(df: DataFrame, features: Seq[String],
      tieBreak: Seq[Column], k: Int, iters: Int = 10,
      out: String = "cluster"): DataFrame = {
    val m = fit(df, features, tieBreak, k, iters)
    // canonical id = perm[argmin]: one evaluation of the argmin CASE, one
    // array-literal lookup (element_at is 1-based)
    val remapped = element_at(
      array(m.perm.map(r => lit(r)).toIndexedSeq: _*),
      assignExpr(m.centroids, features) + 1)
    // the null guard must test the CAST value (fit's filter does): a
    // non-castable string or NaN would otherwise make every distance
    // comparison null, fall through the CASE, and land in cluster k-1
    df.withColumn(out,
      when(features.map(f => !usable(col(f).cast(DoubleType)))
        .reduce(_ || _), lit(null).cast("int"))
        .otherwise(remapped))
  }

  /** Argmin-of-squared-distance CASE chain over `cents` order: cluster j
    * wins iff its distance is <= every LATER cluster's (lowest id takes
    * ties) — float-comparison semantics identical in any engine. */
  private[operators] def assignExpr(cents: Array[Array[Double]],
      features: Seq[String]): Column = {
    def dist(j: Int): Column = features.zipWithIndex.map { case (f, i) =>
      val x = col(f).cast(DoubleType) // pin coercion: double minus double
      (x - lit(cents(j)(i))) * (x - lit(cents(j)(i)))
    }.reduce(_ + _)
    val k = cents.length
    (0 until k - 1).foldRight(lit(k - 1)) { (j, acc) =>
      when((j + 1 until k).map(m => dist(j) <= dist(m)).reduce(_ && _),
        lit(j)).otherwise(acc)
    }
  }

  private def lexCompare(a: Array[Double], b: Array[Double]): Int = {
    var i = 0
    while (i < a.length) {
      val c = java.lang.Double.compare(a(i), b(i))
      if (c != 0) return c
      i += 1
    }
    0
  }

  // ------------------------------------------------------------ oracle SQL

  /** The same computation as `fit`+`withCluster`, unrolled into chained
    * SQL CTEs (DuckDB dialect) — each iteration is one assignment CTE and
    * one centroid-update CTE; every arithmetic step mirrors the Spark
    * side exactly (same IEEE ops on the same values in the same order).
    * `fromSql` is the source relation; `idSql` the tie-break column(s);
    * the result CTE `__km` has the source id/feature columns plus
    * `cluster`. */
  def oracleSql(fromSql: String, idCols: Seq[String], features: Seq[String],
      k: Int, iters: Int = 10): String = {
    val d = features.size
    val js = 0 until k
    def c(j: Int, i: Int) = s"__c${j}_$i"
    // __raw pins every feature to DOUBLE with TRY_CAST — Spark's lenient
    // cast yields NULL for a non-numeric string where DuckDB's strict
    // CAST would error, so TRY_CAST is the parity-correct spelling.
    // __pts (the fit input) keeps only usable rows; __km labels ALL of
    // __raw, null cluster for unusable rows — exactly withCluster's
    // contract (fit skips them, the label pass returns them with NULL)
    val rawCols = (idCols ++ features.map(f => s"TRY_CAST($f AS DOUBLE) AS $f"))
      .mkString(", ")
    val usableSql = features
      .map(f => s"$f IS NOT NULL AND NOT isnan($f)")
      .mkString(" AND ")
    val unusableSql = features
      .map(f => s"$f IS NULL OR isnan($f)")
      .mkString("(", ") OR (", ")")
    val selCols = (idCols ++ features).mkString(", ")
    def distSql(j: Int, prefix: String = "") = features.zipWithIndex.map {
      case (f, i) => s"($f - $prefix${c(j, i)}) * ($f - $prefix${c(j, i)})"
    }.mkString(" + ")
    def argminSql(prefix: String = "") = {
      // k = 1: a CASE with zero WHEN arms is invalid SQL — the argmin is
      // the constant 0 (mirrors assignExpr's empty foldRight)
      if (k == 1) "0" else {
        val whens = (0 until k - 1).map { j =>
          val conds = (j + 1 until k)
            .map(m => s"(${distSql(j, prefix)}) <= (${distSql(m, prefix)})")
            .mkString(" AND ")
          s"WHEN $conds THEN $j"
        }.mkString(" ")
        s"CASE $whens ELSE ${k - 1} END"
      }
    }
    val sb = new StringBuilder
    sb ++= s"__raw AS (SELECT $rawCols FROM $fromSql),\n"
    sb ++= s"__pts AS (SELECT * FROM __raw WHERE $usableSql),\n"
    val ord = (features ++ idCols).mkString(", ")
    sb ++= s"__rk AS (SELECT *, ROW_NUMBER() OVER (ORDER BY $ord) AS __rn" +
      s" FROM __pts),\n"
    sb ++= s"__nn AS (SELECT COUNT(*) AS __n FROM __pts),\n"
    // init: the k quantile rows, rank ((2j+1)n)//(2k)+1
    val initCols = js.flatMap { j =>
      features.zipWithIndex.map { case (f, i) =>
        s"MAX(CASE WHEN __rn = ((${2 * j + 1} * __n) // ${2 * k}) + 1" +
          s" THEN $f END) AS ${c(j, i)}"
      }
    }.mkString(", ")
    sb ++= s"__it0 AS (SELECT $initCols FROM __rk, __nn),\n"
    for (t <- 1 to iters) {
      sb ++= s"__a$t AS (SELECT p.*, c.*, ${argminSql("c.")} AS __cl" +
        s" FROM __pts p CROSS JOIN __it${t - 1} c),\n"
      val upd = js.flatMap { j =>
        features.zipWithIndex.map { case (f, i) =>
          // queries.Det mean: exact decimal sum, one cast to double, a
          // double/bigint divide; empty cluster → NULL → keep previous
          s"COALESCE(CAST(SUM(CASE WHEN __cl = $j THEN" +
            s" CAST($f AS DECIMAL(30,6)) END) AS DOUBLE)" +
            s" / COUNT(CASE WHEN __cl = $j THEN 1 END)," +
            s" MAX(${c(j, i)})) AS ${c(j, i)}"
        }
      }.mkString(", ")
      sb ++= s"__it$t AS (SELECT $upd FROM __a$t),\n"
    }
    // canonical relabel: rank_j = #{m : centroid_m <lex centroid_j, ties
    // by original id}
    def lexLess(m: Int, j: Int): String = {
      val clauses = (0 until d).map { i =>
        val eqs = (0 until i).map(x => s"${c(m, x)} = ${c(j, x)}")
        (eqs :+ s"${c(m, i)} < ${c(j, i)}").mkString("(", " AND ", ")")
      }
      val allEq = (0 until d).map(x => s"${c(m, x)} = ${c(j, x)}")
        .mkString("(", " AND ", s" AND $m < $j)")
      (clauses :+ allEq).mkString("(", " OR ", ")")
    }
    val rankCols = js.map { j =>
      val terms = js.filter(_ != j)
        .map(m => s"CASE WHEN ${lexLess(m, j)} THEN 1 ELSE 0 END")
      s"(${if (terms.isEmpty) "0" else terms.mkString(" + ")}) AS __rank_$j"
    }.mkString(", ")
    sb ++= s"__rel AS (SELECT *, $rankCols FROM __it$iters),\n"
    val remap = js.map(j => s"WHEN $j THEN __rank_$j").mkString(" ")
    sb ++= s"__km AS (SELECT $selCols," +
      s" CAST(CASE WHEN $unusableSql THEN NULL" +
      s" ELSE (CASE ${argminSql("")} $remap END) END AS INTEGER) AS cluster" +
      s" FROM __raw CROSS JOIN __rel)"
    sb.toString
  }
}
