package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic synthesis of the flagship input table
  * `(doc_id:string, tokens:array<int32>, n_tok:int32, source:string)`
  * (BASELINE.json input_hint) — pure column expressions seeded by row id, no
  * RNG, so any two runs (and any two engines reading the written parquet)
  * see identical data at any parallelism.
  *
  * The `source` tag pool is Zipf-skewed — one hot tag takes ~40% of rows —
  * to exercise hot-tag salting in the fan-out write, mirroring the
  * reference's catch-all-tag hotspot (README.md:119-123).
  */
object Synth {

  /** (tag, weight) pool; weights sum to 100. */
  val tagPool: Seq[(String, Int)] = Seq(
    "td.apache.access"    -> 40, // hot tag
    "td.nginx.access"     -> 15,
    "input.tomcat.access" -> 12,
    "game.production.api" -> 9,
    "input"               -> 7,
    "kubernetes.var.log"  -> 6,
    "td.apache.error"     -> 4,
    "game.staging.api"    -> 3,
    "metrics.node.cpu"    -> 3,
    "app.web.request"     -> 1)

  val vocabSize = 50257 // GPT-2-ish vocab, arbitrary but fixed
  val maxLen = 64

  /** n deterministic sequence rows. `partitions > 0` sets the split count at
    * the range source (same rows regardless — content is keyed on id only).
    */
  def sequences(spark: SparkSession, n: Long, seed: Long = 42L,
      partitions: Int = 0): DataFrame = {
    val weighted: Seq[String] = tagPool.flatMap { case (t, w) => Seq.fill(w)(t) }
    val pool = array(weighted.map(lit): _*)
    (if (partitions > 0) spark.range(0L, n, 1L, partitions) else spark.range(n))
      .withColumn("h", abs(xxhash64(col("id"), lit(seed))))
      .select(
        format_string("doc-%012d", col("id")).as("doc_id"),
        transform(
          sequence(lit(0), pmod(col("h"), lit(maxLen)).cast("int")),
          i => pmod(xxhash64(col("id"), i, lit(seed)), lit(vocabSize)).cast("int")
        ).as("tokens"),
        col("h"),
        col("id"))
      .withColumn("n_tok", size(col("tokens")))
      .withColumn("source",
        get(pool, pmod(xxhash64(col("id"), lit(seed + 1)), lit(weighted.size)).cast("int")))
      .select("doc_id", "tokens", "n_tok", "source")
  }

  /** n deterministic DOCUMENT rows `(doc_id:long, text:string, lang:string,
    * n_chars:long)` with a CONTROLLED duplicate structure, for scaling the
    * dedup operators:
    *  - ids ≡ 0,1,2 (mod 8) share one 40-word text (exact-dup clusters of 3);
    *  - id ≡ 3 (mod 8) is a NEAR-dup of that cluster (same words + one extra);
    *  - ids ≡ 4..7 are unique texts.
    * Pure column expressions keyed on id — identical at any parallelism.
    */
  def documents(spark: SparkSession, n: Long, seed: Long = 42L,
      partitions: Int = 0): DataFrame = {
    val langs = array(Seq("en", "de", "fr", "es", "zh").map(lit): _*)
    (if (partitions > 0) spark.range(0L, n, 1L, partitions) else spark.range(n))
      .withColumn("r", pmod(col("id"), lit(8)))
      // word-base: the id whose word stream this row copies
      .withColumn("wb", when(col("r") <= 3, col("id") - col("r")).otherwise(col("id")))
      .withColumn("body", concat_ws(" ",
        transform(sequence(lit(0), lit(39)),
          i => concat(lit("w"), pmod(xxhash64(col("wb"), i, lit(seed)), lit(5000))))))
      .select(
        col("id").as("doc_id"),
        when(col("r") === 3, concat(col("body"), lit(" zz"), col("id")))
          .otherwise(col("body")).as("text"),
        get(langs, pmod(xxhash64(col("id"), lit(seed + 7)), lit(5)).cast("int")).as("lang"))
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  /** Write-once documents table (see [[materialize]] rationale). */
  def materializeDocuments(spark: SparkSession, n: Long, dir: String,
      seed: Long = 42L, partitions: Int = 256): String = {
    val path = s"$dir/documents_n${n}_s${seed}_p$partitions"
    if (!new java.io.File(path, "_SUCCESS").exists()) {
      documents(spark, n, seed, partitions).write.mode("overwrite").parquet(path)
    }
    path
  }

  /** Deterministic event stream for the logops scaling workload: ~50
    * events per user, timestamps uniform over one day (mean per-user gap
    * ≈ 1.7 ks, so an 1800 s sessionization threshold yields a healthy mix
    * of session breaks and continuations), hash-assigned users (realistic
    * shuffle skew profile: multinomial, no planted hot key). Pure column
    * expressions keyed on id — identical at any parallelism.
    */
  def events(spark: SparkSession, n: Long, seed: Long = 42L,
      partitions: Int = 0): DataFrame = {
    val users = math.max(n / 50L, 1L)
    (if (partitions > 0) spark.range(0L, n, 1L, partitions) else spark.range(n))
      .select(
        col("id").as("event_id"),
        pmod(xxhash64(col("id"), lit(seed)), lit(users)).as("user_id"),
        timestamp_seconds(pmod(xxhash64(col("id"), lit(seed + 1)), lit(86400L))).as("ts"),
        (pmod(xxhash64(col("id"), lit(seed + 2)), lit(10000L)).cast("double") / 100.0).as("value"))
  }

  /** Write-once events table (see [[materialize]] rationale). */
  def materializeEvents(spark: SparkSession, n: Long, dir: String,
      seed: Long = 42L, partitions: Int = 256): String = {
    val path = s"$dir/events_n${n}_s${seed}_p$partitions"
    if (!new java.io.File(path, "_SUCCESS").exists()) {
      events(spark, n, seed, partitions).write.mode("overwrite").parquet(path)
    }
    path
  }

  /** Write-once helper for benches: synthesize to parquet if absent, return
    * path. Reading from disk makes N-vs-4N timing measure the pipeline, not
    * the generator.
    */
  def materialize(spark: SparkSession, n: Long, dir: String, seed: Long = 42L,
      partitions: Int = 256): String = {
    // many small partitions → several task waves at every parallelism level,
    // so stragglers average out and N-vs-4N timing measures compute, not the
    // slowest task of a single wave
    val path = s"$dir/sequences_n${n}_s${seed}_p$partitions"
    if (!new java.io.File(path, "_SUCCESS").exists()) {
      // partition count fixed at the range source — a generate-then-
      // repartition would shuffle the whole dataset (and its spill files
      // can exceed the sandbox disk budget at 10^8+ rows) for no benefit
      sequences(spark, n, seed, partitions)
        .write.mode("overwrite").parquet(path)
    }
    path
  }
}
