package graft.sketch

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** KMV (k-minimum-values) distinct-count sketch over an md5-hashed column.
  *
  * Estimator: with U₍ₖ₎ the k-th smallest of the values' hashes normalized
  * to [0, 1), the distinct count is ≈ (k-1)/U₍ₖ₎ (Bar-Yossef et al.'s KMV /
  * bottom-k estimator; standard error ~1/√k). State is the k smallest
  * distinct hashes — bounded, mergeable, partial-aggregatable
  * ([[graft.expressions.KMinStringsAgg]]) — so the shuffle carries ≤k short
  * strings per (group, map partition) where `count(distinct)` would shuffle
  * every distinct value and HLL would be engine-specific.
  *
  * Determinism is the point: md5 is identical everywhere, so the estimate is
  * a pure function of the data — the same number on every run, engine, and
  * cluster size, and the DuckDB oracle recomputes it exactly. The hash
  * fraction uses the first 13 hex chars = 52 bits, exactly representable in
  * a double: no cross-engine rounding at all.
  */
object Kmv {

  /** 16^13 = 2^52 — the normalization denominator, exact in a double. */
  val Scale: Double = 4503599627370496.0

  /** Distinct-count estimate from a sorted k-min array (as produced by
    * KMinStringsAgg over md5 values): exact size when the group had fewer
    * than k distinct values, else floor((k-1)·2^52 / prefix52(kth)).
    */
  def estimateFromKmin(kmin: Column, k: Int): Column = {
    val kth = element_at(kmin, k)
    val v = greatest(conv(substring(kth, 1, 13), 16, 10).cast("double"), lit(1.0))
    when(size(kmin) < k, size(kmin).cast("long"))
      .otherwise(floor(lit((k - 1).toDouble * Scale) / v))
  }

  /** Pairwise set-overlap estimates between every two groups, from their
    * bounded KMV sketches — the join-size/contamination planning tool:
    * "how many distinct values do sources A and B share?" without ever
    * joining A against B.
    *
    * Standard KMV set algebra (Beyer et al., "On synopses for distinct-
    * value estimation under multiset operations"): the k smallest of
    * K_A ∪ K_B is a valid KMV sketch of A ∪ B, so `union_est` reuses the
    * bottom-k estimator; the members of that combined sketch present in
    * BOTH input sketches are a uniform k-sample of the union, so
    * `j_num / m` estimates Jaccard and `inter_est = j_num · union_est
    * div m` the distinct intersection (exact integer division — the
    * estimate is a pure deterministic function of the data, and the
    * DuckDB oracle reproduces every output bit).
    *
    * Shape at scale: one partial+final sketch aggregate over the corpus
    * (≤ k short strings per group per task), then an all-pairs join of
    * the GROUP-count-sized sketch frame (sources/shards/days — thousands
    * at most; the nested-loop pair join is over |groups|² sketch rows,
    * never data). The corpus itself is read once and never pair-joined.
    */
  def overlapByGroup(
      df: DataFrame, groupCol: String, valueCol: String, k: Int = 64): DataFrame = {
    require(k >= 2, s"overlapByGroup needs k >= 2, got $k")
    val sk = df.where(col(valueCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(graft.expressions.KMinStringsAgg(md5(col(valueCol)), k).as("kmin"))
    val a = sk.select(col(groupCol).cast("string").as("src_a"), col("kmin").as("__ka"))
    val b = sk.select(col(groupCol).cast("string").as("src_b"), col("kmin").as("__kb"))
    a.join(b, col("src_a") < col("src_b"))
      .withColumn("__uni", array_sort(array_union(col("__ka"), col("__kb"))))
      .withColumn("__merged", slice(col("__uni"), 1, k))
      .withColumn("m", size(col("__merged")).cast("long"))
      .withColumn("j_num",
        size(filter(col("__merged"),
          h => array_contains(col("__ka"), h) && array_contains(col("__kb"), h))).cast("long"))
      .withColumn("union_est", estimateFromKmin(col("__uni"), k))
      .withColumn("inter_est", expr("j_num * union_est div m"))
      .select(col("src_a"), col("src_b"), col("m"), col("j_num"),
        col("union_est"), col("inter_est"))
  }

  /** Per-group distinct-count estimate of `valueCol`. */
  def distinctByGroup(
      df: DataFrame, groupCol: String, valueCol: String, k: Int = 64): DataFrame =
    df.groupBy(groupCol)
      .agg(
        count(lit(1)).as("n_rows"),
        graft.expressions.KMinStringsAgg(md5(col(valueCol)), k).as("__kmin"))
      .select(col(groupCol), col("n_rows"),
        estimateFromKmin(col("__kmin"), k).as("distinct_est"))
}
