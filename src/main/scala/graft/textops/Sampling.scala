package graft.textops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Deterministic dataset splitting for training pipelines.
  *
  * `rand()`-based sampling is wrong at 100 TB: it is not reproducible across
  * runs, not stable under task retries (a re-executed partition re-rolls its
  * rows), and not consistent between engines. Hash-splitting assigns each
  * row a split from the md5 of a salted key — a pure, shuffle-free
  * projection with none of those failure modes, and the SAME assignment in
  * any engine (the DuckDB oracle reproduces it exactly). Changing the salt
  * re-rolls the split; keeping it pins the split forever, which is what a
  * training/eval contamination boundary needs.
  */
object Sampling {

  /** Bucket in [0, 65536): first 4 hex chars of md5(salt ":" key). */
  def hashBucket(key: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt), lit(":"), key.cast("string"))), 1, 4),
      16, 10).cast("int")

  /** Integer thresholds actually used: floor(cumFraction * 65536) — exposed
    * so oracles can mirror the exact boundaries.
    */
  def thresholds(splits: Seq[(String, Double)]): Seq[(String, Int)] = {
    require(splits.nonEmpty, "hashSplit needs at least one split")
    require(splits.map(_._2).forall(_ > 0), "split fractions must be positive")
    val total = splits.map(_._2).sum
    require(math.abs(total - 1.0) < 1e-9, s"split fractions must sum to 1, got $total")
    val cum = splits.map(_._2).scanLeft(0.0)(_ + _).tail
    splits.map(_._1).zip(cum.map(c => math.floor(c * 65536).toInt))
  }

  /** Split label for `key` under `splits` (label, fraction) in order. */
  def splitLabel(key: Column, splits: Seq[(String, Double)], salt: String): Column = {
    val ts = thresholds(splits)
    val b = hashBucket(key, salt)
    // last label is the ELSE arm so the full bucket range is always covered
    ts.init.foldRight(lit(ts.last._1): Column) { case ((label, t), acc) =>
      when(b < t, lit(label)).otherwise(acc)
    }
  }

  /** Annotate `df` with a `split` column. Pure projection: no shuffle, no
    * state, stable under retries, identical on every engine.
    */
  def hashSplit(
      df: DataFrame,
      keyCol: String,
      splits: Seq[(String, Double)],
      salt: String = "graft"): DataFrame =
    df.withColumn("split", splitLabel(col(keyCol), splits, salt))
}
