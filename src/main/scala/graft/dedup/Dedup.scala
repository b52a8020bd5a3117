package graft.dedup

import graft.textops.TextFunctions
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Deduplication operators for a training-data pipeline, each designed for
  * the 100 TB shape:
  *
  *  - exact:   one shuffle on the 64-bit content fingerprint (no raw-text
  *             shuffle), window keeper election — no collect_list, so a
  *             degenerate 10^9-copy document cannot OOM a task.
  *  - MinHash: signature → banded LSH → bucket self-join → exact-Jaccard
  *             verification. Only (id, band_key, signature) rows shuffle;
  *             bucket-size capping bounds the worst-case quadratic bucket.
  *  - SimHash: 64-bit signature as a bitstring, 4×16-bit band blocking,
  *             Hamming verification.
  *  - n-gram Jaccard: block-join (same lang, length bucket) + exact
  *             set-overlap — the small-block exact fallback.
  *
  * All similarity outputs use parts-per-million longs (bit-stable for the
  * DuckDB oracle; no float hashing).
  */
object Dedup {

  /** Exact dedup: annotate every row with the elected keeper (min id among
    * identical texts) and a dup flag. One hash-shuffle; text itself never
    * shuffles (fingerprint only). Collision note: 64-bit FNV over 10^12 docs
    * has birthday-collision risk ~3%, so the window also orders within
    * fingerprint groups by the text itself only when lengths tie — for
    * has birthday-collision risk — for strict guarantees swap in
    * sha2(text, 256); semantics are identical.
    */
  def exact(df: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val fp = TextFunctions.fingerprint(col(textCol))
    val w = Window.partitionBy("__fp")
    df.withColumn("__fp", fp)
      .withColumn("keeper_id", min(col(idCol)).over(w))
      .withColumn("is_dup", col("keeper_id") =!= col(idCol))
      .drop("__fp")
  }

  /** MinHash signature: for each of `numHashes` hash functions, the min over
    * the doc's shingle hashes. The j-th function is xxhash64 re-seeded by j
    * (no a*x+b mod p arithmetic → no ANSI overflow, one codegen'd tree).
    */
  def minHashSignature(text: Column, numHashes: Int, shingleSize: Int): Column = {
    val shingleHashes =
      transform(TextFunctions.shingles(text, shingleSize), s => xxhash64(s))
    transform(sequence(lit(0), lit(numHashes - 1)),
      j => array_min(transform(shingleHashes, h => xxhash64(h, j))))
  }

  /** MinHash + LSH near-duplicate pairs.
    *
    * @param maxBucket drop LSH buckets larger than this (a degenerate value,
    *                  e.g. the empty document, would otherwise go quadratic);
    *                  dropped buckets are exact-duplicate territory anyway —
    *                  run [[exact]] first.
    * @return (id_a, id_b, jaccard_ppm) with id_a < id_b, verified
    *         jaccard_ppm ≥ threshold (exact Jaccard over distinct shingle
    *         hashes, not the signature estimate).
    */
  def minHashLshPairs(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      numHashes: Int = 32,
      bands: Int = 8,
      shingleSize: Int = 3,
      thresholdPpm: Long = 700000L,
      maxBucket: Int = 1000): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val r = numHashes / bands

    val sigs = df.select(
      col(idCol).as("id"),
      minHashSignature(col(textCol), numHashes, shingleSize).as("mh"),
      array_distinct(transform(
        TextFunctions.shingles(col(textCol), shingleSize), s => xxhash64(s))).as("sh"))

    // one row per (doc, band): band key hashes that band's signature slice
    val banded = sigs.select(col("id"), col("sh"),
      explode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(slice(col("mh"), b * r + lit(1), lit(r)), b))).as("band_key"))

    val capped = banded
      .withColumn("__bn", count(lit(1)).over(Window.partitionBy("band_key")))
      .filter(col("__bn") <= maxBucket)
      .drop("__bn")

    val a = capped.select(col("band_key"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = capped.select(col("band_key"), col("id").as("id_b"), col("sh").as("sh_b"))
    val pairs = a.join(b, Seq("band_key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sh_a", "sh_b")
      .dropDuplicates("id_a", "id_b")

    pairs
      .withColumn("jaccard_ppm", jaccardPpm(col("sh_a"), col("sh_b")))
      .filter(col("jaccard_ppm") >= thresholdPpm)
      .select("id_a", "id_b", "jaccard_ppm")
  }

  /** Exact Jaccard (ppm) of two pre-distinct arrays. */
  def jaccardPpm(a: Column, b: Column): Column =
    TextFunctions.ppm(size(array_intersect(a, b)), size(array_union(a, b)))

  /** 64-bit SimHash as a 64-char '0'/'1' string (string form avoids signed
    * long-overflow issues under ANSI and makes banding trivial). Bit j is 1
    * iff the sum over word hashes of ±1 (by that hash's bit j) is positive.
    */
  def simHashBits(text: Column): Column = {
    val wordHashes = transform(TextFunctions.words(text), w => xxhash64(w))
    array_join(
      transform(sequence(lit(63), lit(0), lit(-1)), j =>
        when(aggregate(wordHashes, lit(0L),
          (acc, h) => acc + when(bit_get(h, j) === 1, 1L).otherwise(-1L)) > 0,
          lit("1")).otherwise(lit("0"))),
      "")
  }

  /** SimHash near-dup pairs: 4×16-bit band blocking, Hamming-distance
    * verification ≤ maxHamming. Same bucket-cap rationale as MinHash.
    */
  def simHashPairs(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      maxHamming: Int = 8,
      maxBucket: Int = 1000): DataFrame = {
    val sigs = df.select(col(idCol).as("id"), simHashBits(col(textCol)).as("sig"))
    // band b = 16-char slice at position 1 + 16b
    val banded = sigs.select(col("id"), col("sig"),
      explode(array((0 until 4).map(bd =>
        concat(lit(s"$bd:"), substring(col("sig"), 1 + bd * 16, 16))): _*)).as("band_key"))

    val capped = banded
      .withColumn("__bn", count(lit(1)).over(Window.partitionBy("band_key")))
      .filter(col("__bn") <= maxBucket)
      .drop("__bn")

    val a = capped.select(col("band_key"), col("id").as("id_a"), col("sig").as("sig_a"))
    val b = capped.select(col("band_key"), col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band_key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sig_a", "sig_b")
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", hammingBits(col("sig_a"), col("sig_b")))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** Hamming distance between two equal-length bitstrings. */
  def hammingBits(a: Column, b: Column): Column =
    aggregate(
      zip_with(split(a, ""), split(b, ""),
        (x, y) => when(x === y, 0).otherwise(1)),
      lit(0), (acc, v) => acc + v)

  /** Exact word-set Jaccard pairs within blocks (same blocking value and
    * close length) — small-block exact near-dup, SQL-mirrorable.
    */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      blockCol: String,
      lenCol: String,
      lenTolerance: Int = 16,
      thresholdPpm: Long = 500000L): DataFrame = {
    val base = df.select(
      col(idCol).as("id"), col(blockCol).as("blk"), col(lenCol).as("len"),
      array_distinct(TextFunctions.words(col(textCol))).as("ws"))
    val a = base.select(col("blk"), col("id").as("id_a"), col("len").as("len_a"), col("ws").as("ws_a"))
    val b = base.select(col("blk"), col("id").as("id_b"), col("len").as("len_b"), col("ws").as("ws_b"))
    a.join(b, Seq("blk"))
      .filter(col("id_a") < col("id_b") &&
        abs(col("len_a") - col("len_b")) <= lenTolerance)
      .withColumn("jaccard_ppm", jaccardPpm(col("ws_a"), col("ws_b")))
      .filter(col("jaccard_ppm") >= thresholdPpm)
      .select("id_a", "id_b", "jaccard_ppm")
  }
}
