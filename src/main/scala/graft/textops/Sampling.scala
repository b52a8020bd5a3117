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

  /** Deterministic per-group quota sample: the `k` rows of each group with
    * the smallest md5(salt ":" key) — a uniform-without-replacement sample
    * per stratum (language, source, ...) that is reproducible across runs,
    * engines, and task retries, like [[hashSplit]] but with an exact
    * per-group COUNT instead of a fraction (stratified splits need quotas;
    * a fraction over a skewed stratum over/under-shoots).
    *
    * Shape at scale: the winners are elected by the bounded
    * [[graft.expressions.KMinStringsAgg]] — partial+final aggregate whose
    * state is ≤ k strings per group on every side of the shuffle. No
    * window ranks the corpus, no group's rows are ever gathered. The rank
    * is recovered from the sorted winner array's position (the aggregate
    * returns its TreeSet ascending).
    *
    * The md5 hex prefix (32 fixed chars) makes "hash:key" order ≡
    * (hash, key-string) order, so the DuckDB oracle is a plain
    * `row_number() OVER (ORDER BY md5(...), key)`.
    */
  def quotaSample(
      df: DataFrame,
      groupCol: String,
      keyCol: String,
      k: Int,
      salt: String = "graft"): DataFrame = {
    require(k > 0, s"quotaSample k must be positive, got $k")
    val keyStr = col(keyCol).cast("string")
    val tagged = concat(md5(concat(lit(salt), lit(":"), keyStr)), lit(":"), keyStr)
    df.groupBy(col(groupCol))
      .agg(graft.expressions.KMinStringsAgg(tagged, k).as("winners"))
      .select(col(groupCol), posexplode(col("winners")).as(Seq("pos", "w")))
      .select(col(groupCol), (col("pos") + 1).cast("long").as("rk"),
        // the md5 prefix is exactly 32 hex chars + ":", so the key starts
        // at char 34 — position-based, safe for keys containing ":"
        substring(col("w"), 34, Int.MaxValue).as("sample_key"))
  }

  /** Deterministic domain-mixture downsampling: each row is kept with its
    * group's rate (e.g. source/domain → fraction), decided purely by
    * md5(salt ":" key) — the mixture-reweighting pass every training
    * pipeline runs (upsample curated domains, downsample crawl), with the
    * same retry/engine/run stability argument as [[hashSplit]].
    *
    * Rates are applied as integer bucket thresholds (floor(rate · 65536)
    * over the [[hashBucket]] space) so the decision boundary is exact and
    * the oracle mirrors it bit-for-bit. A group absent from `rates` gets
    * `defaultRate`. Shuffle-free narrow projection + filter: survives any
    * scale, and because the hash is keyed on the ROW key (not the group),
    * per-group survivor counts are binomial around rate·n with no
    * coordination.
    */
  def mixSample(
      df: DataFrame,
      groupCol: String,
      keyCol: String,
      rates: Map[String, Double],
      defaultRate: Double,
      salt: String = "graft"): DataFrame = {
    (rates.values.toSeq :+ defaultRate).foreach { r =>
      require(r >= 0 && r <= 1, s"mixSample rates must be in [0,1], got $r")
    }
    val threshold = rates.toSeq.sortBy(_._1)
      .foldRight(lit(math.floor(defaultRate * 65536).toInt): Column) {
        case ((g, r), acc) =>
          when(col(groupCol) === g, lit(math.floor(r * 65536).toInt)).otherwise(acc)
      }
    df.where(hashBucket(col(keyCol), salt) < threshold)
  }
}
