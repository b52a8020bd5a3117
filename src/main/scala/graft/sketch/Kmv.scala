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
