package graft.ann

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Similarity search over an embedding column (`array<float>`):
  *
  *  - brute-force cosine top-k: the exact baseline — broadcast the (small)
  *    query set against the corpus, one narrow pass, then TWO-STAGE top-k:
  *    local rank within (query, input-partition) keeps k rows per query per
  *    partition, the global rank then orders only k×P survivors per query.
  *    No task ever sorts more than its own partition's candidates — a window
  *    over bare `query_id` would put the ENTIRE corpus in one task per query.
  *  - LSH-bucketed ANN (random hyperplanes): deterministic planes, sign
  *    bits → bucket key; candidate set = same-bucket rows, exact rerank
  *    inside the bucket. The scale path: bucket count grows 2^P, the
  *    corpus shuffles once by bucket and queries probe only their bucket.
  *
  * All dot products run in double through the one-pass codegen'd
  * [[graft.expressions.DotDouble]] expression (higher-order functions run
  * interpreted and allocate a zipped array per pair — measurably the hot
  * spot of the pair joins); [[dotSql]] keeps the built-in formulation as
  * the bit-identical differential oracle. No UDFs anywhere.
  */
object Ann {

  /** Sum of elementwise products, in double (one-pass expression). */
  def dot(a: Column, b: Column): Column =
    graft.expressions.DotDouble(a, b)

  /** Built-in `zip_with`+`aggregate` formulation of [[dot]] — the semantics
    * definition and differential oracle (same IEEE summation order).
    */
  def dotSql(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0 when either vector is all-zero. */
  def cosine(a: Column, b: Column): Column =
    cosinePrenormed(a, b, norm(a), norm(b))

  /** Cosine with caller-supplied norms — precompute the norms per ROW
    * before a pair join so each pair costs one dot product, not three.
    * Same IEEE expression shape as [[cosine]] (oracle-parity safe).
    */
  def cosinePrenormed(a: Column, b: Column, na: Column, nb: Column): Column = {
    val d = na * nb
    when(d === 0.0, lit(0.0)).otherwise(dot(a, b) / d)
  }

  /** Shared scoring stage: broadcast the query set, one narrow corpus pass,
    * (query_id, neighbor_id, sim_ppm) projection — vectors never leave the
    * map side. Norms precomputed per row (1 dot per pair instead of 3).
    */
  private def scoredPairs(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String): DataFrame = {
    val q = broadcast(queries.select(
      col(idCol).as("query_id"), col(vecCol).as("qv"), norm(col(vecCol)).as("qn")))
    corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"), norm(col(vecCol)).as("cn"))
      .join(q, col("neighbor_id") =!= col("query_id"))
      .withColumn("sim_ppm", floor(cosinePrenormed(
        col("qv"), col("cv"), col("qn"), col("cn")) * 1000000.0))
      .select("query_id", "neighbor_id", "sim_ppm")
  }

  /** Exact top-k neighbors for each query row, via the bounded
    * [[graft.expressions.TopKPairsAgg]] aggregate: each map task keeps a
    * k-element heap per query, so the shuffle carries at most k entries per
    * (query, map partition) — not the scored candidate set. A window
    * formulation (even two-stage, [[bruteForceTopKWindow]]) must move every
    * scored row once; this is the plan that survives top-10-of-10^9.
    *
    * @param corpus  (idCol, vecCol) big side — scanned once, never shuffled.
    * @param queries (idCol, vecCol) small side — broadcast.
    * @return (query_id, neighbor_id, rank, sim_ppm) — rank 1..k by
    *         (sim desc, neighbor_id asc); self-matches excluded; sim as
    *         parts-per-million long for cross-engine stability.
    */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      k: Int = 10): DataFrame =
    topKTail(scoredPairs(corpus, queries, idCol, vecCol), k)

  /** Shared top-k tail over a scored (query_id, neighbor_id, sim_ppm)
    * frame: bounded-heap aggregate → (rank, neighbor, sim) rows. One
    * definition for the brute-force baseline AND the bucketed variants, so
    * the output shape and (sim desc, id asc) tie-break can never diverge
    * between the differential baseline and what it checks.
    */
  private def topKTail(scored: DataFrame, k: Int): DataFrame =
    scored
      .groupBy("query_id")
      .agg(graft.expressions.TopKPairsAgg(col("sim_ppm"), col("neighbor_id"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("query_id"), col("t.neighbor_id").as("neighbor_id"),
        (col("pos") + 1).cast("int").as("rank"), col("t.sim_ppm").as("sim_ppm"))

  /** Symmetric per-vector int8 quantization: scale = max|v_i|, each element
    * maps to round(127·v/scale) ∈ [-127, 127] (all-zero vectors quantize to
    * all-zero). This is the standard bandwidth/memory lever for
    * billion-vector search — a float32 corpus shrinks 4× and the rerank dot
    * product becomes exact integer arithmetic (cross-engine bit-stable: no
    * float summation anywhere in the score). The per-row scale is computed
    * once in its own projection (NOT inlined into the element lambda — the
    * max would re-evaluate per element), then the quantized array replaces
    * the float vector; everything stays narrow.
    *
    * @return input frame with `qvecCol` (array<long> in [-127,127]) added.
    */
  def quantizeInt8(df: DataFrame, vecCol: String, qvecCol: String): DataFrame =
    // one-pass codegen'd expression; [[quantizeInt8Sql]] is the semantics
    // definition and differential oracle (SpanExprSpec)
    df.withColumn(qvecCol, graft.expressions.QuantizeInt8Expr(col(vecCol)))

  /** Pure-built-in formulation of [[quantizeInt8]] (differential oracle).
    * The per-row scale is computed in its own projection (NOT inlined into
    * the element lambda — the max would re-evaluate per element).
    */
  def quantizeInt8Sql(df: DataFrame, vecCol: String, qvecCol: String): DataFrame =
    df
      .withColumn("__qs",
        array_max(transform(col(vecCol), x => abs(x.cast("double")))))
      .withColumn(qvecCol,
        when(col("__qs") === 0.0,
          transform(col(vecCol), _ => lit(0L)))
          .otherwise(transform(col(vecCol),
            x => round(lit(127.0) * x.cast("double") / col("__qs")).cast("long"))))
      .drop("__qs")

  /** Exact top-k under the QUANTIZED similarity: both sides int8-quantized,
    * score = floor(1e6 · qdot / (‖q‖·‖c‖)) where qdot and the squared norms
    * are exact integer dot products (through the same codegen'd
    * [[graft.expressions.DotDouble]] — long inputs, integer-valued doubles,
    * exact below 2^53). Same broadcast + bounded-heap tail as
    * [[bruteForceTopK]]; the corpus is scanned once and only (query_id,
    * neighbor_id, qsim_ppm) rows reach the aggregate.
    *
    * @return (query_id, neighbor_id, rank, qsim_ppm), rank 1..k by
    *         (qsim desc, neighbor_id asc).
    */
  def quantizedTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      k: Int = 10): DataFrame = {
    def prep(df: DataFrame, id: String, v: String, n: String): DataFrame =
      quantizeInt8(df.select(col(idCol).as(id), col(vecCol).as("__v")), "__v", v)
        .withColumn(n, dot(col(v), col(v))) // integer-valued double, exact
        .drop("__v")
    val q = broadcast(prep(queries, "query_id", "qv", "qn"))
    val scored = prep(corpus, "neighbor_id", "cv", "cn")
      .join(q, col("neighbor_id") =!= col("query_id"))
      .withColumn("sim_ppm",
        when(col("qn") === 0.0 || col("cn") === 0.0, lit(0L))
          .otherwise(floor(dot(col("qv"), col("cv")) * 1000000.0 /
            (sqrt(col("qn")) * sqrt(col("cn"))))))
      .select("query_id", "neighbor_id", "sim_ppm")
    topKTail(scored, k).withColumnRenamed("sim_ppm", "qsim_ppm")
  }

  /** Per-label centroids over the QUANTIZED embedding space — the
    * embedding-space diagnostic view (class centroid drift, label balance)
    * with every output integer-derived and therefore cross-engine
    * bit-stable: float vectors quantize per-row first ([[quantizeInt8]]),
    * then (label, dim) sums aggregate exact integers. The explode produces
    * dim× rows per vector, but the partial (map-side) aggregate collapses
    * them to ≤ |labels|·dim rows per task before the shuffle — at 10^9
    * vectors the wire carries label-count-sized partials, never vectors.
    * centroid_milli = floor(1000·sum/n), computed through exact-integer
    * doubles (sums ≪ 2^53), identical association on both engines.
    *
    * @return (labelCol, dim, sum_q, n, centroid_milli), one row per
    *         (label, dimension).
    */
  def quantizedCentroids(
      df: DataFrame,
      labelCol: String = "label",
      vecCol: String = "embedding"): DataFrame =
    quantizeInt8(df.select(col(labelCol), col(vecCol)), vecCol, "__qv")
      .select(col(labelCol), posexplode(col("__qv")).as(Seq("dim", "q")))
      .groupBy(col(labelCol), col("dim").cast("long").as("dim"))
      .agg(sum("q").as("sum_q"), count(lit(1)).as("n"))
      .withColumn("centroid_milli",
        floor(col("sum_q").cast("double") * 1000.0 / col("n")))

  /** Bit-exact duplicate-VECTOR dedup over the quantized embedding space:
    * identical int8-quantized vectors (re-encoded crops, re-scaled copies
    * of the same asset, repeated documents with shared embeddings) elect a
    * min-id keeper. The group key is the md5 of the comma-joined quantized
    * elements — only the 128-bit fingerprint ever shuffles, never the
    * vector, and the election is the same partial+final min as text dedup
    * (a 10^8-copy hot vector collapses map-side).
    *
    * @return (idCol, keeper_id, is_dup).
    */
  /** md5 fingerprint of a quantized vector's elements (comma-joined
    * decimal) — ONE definition shared by the batch ([[embedExactDedup]])
    * and streaming (`StreamRouter.dedupEmbed`) duplicate-vector faces.
    */
  def quantFingerprint(qvec: Column): Column =
    md5(concat_ws(",", transform(qvec, _.cast("string"))))

  def embedExactDedup(
      df: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val q = quantizeInt8(df.select(col(idCol), col(vecCol)), vecCol, "__qv")
      .withColumn("__fp", quantFingerprint(col("__qv")))
    val keepers = q.select(col("__fp").as("__kfp"), col(idCol).as("keeper_id"))
      .groupBy("__kfp").agg(min("keeper_id").as("keeper_id"))
    q.join(keepers, col("__fp") === col("__kfp"))
      .withColumn("is_dup", col("keeper_id") =!= col(idCol))
      .select(col(idCol), col("keeper_id"), col("is_dup"))
  }

  /** Per-label embedding diversity WITHOUT a pair join: the mean pairwise
    * quantized dot product from the sum-vector identity
    * Σ_{i≠j} x_i·x_j = ‖Σx‖² − Σ‖x‖², so an O(n²) statistic costs one
    * O(n·d) aggregation pass — the only shape that works when a label has
    * 10^8 members. All sums are exact integers (per-dim totals ride the
    * same map-side-combined explode as [[quantizedCentroids]]); the final
    * milli-scaled mean divides through doubles with identical association
    * on both engines. Numeric bound: per-dim totals square inside int64
    * while n·127 < 3·10^9 per label, and the double division is EXACT
    * (below 2^53) while Σ(S_d²) < 9·10^15 — beyond that, promote the two
    * sum columns to decimal(38,0) (Spark) / HUGEINT (DuckDB); the plan
    * shape is unchanged.
    *
    * @return (labelCol, n, sum_sq, self_sq, mean_pair_dot_milli) for
    *         labels with ≥ 2 members.
    */
  def quantizedDiversity(
      df: DataFrame,
      labelCol: String = "label",
      vecCol: String = "embedding"): DataFrame = {
    val q = quantizeInt8(df.select(col(labelCol), col(vecCol)), vecCol, "__qv")
      .withColumn("__self", dot(col("__qv"), col("__qv")).cast("long"))
    val sums = q.select(col(labelCol), posexplode(col("__qv")).as(Seq("dim", "qd")))
      .groupBy(col(labelCol), col("dim")).agg(sum("qd").as("sd"))
      .groupBy(col(labelCol)).agg(sum(col("sd") * col("sd")).as("sum_sq"))
    val selfs = q.groupBy(col(labelCol))
      .agg(count(lit(1)).as("n"), sum("__self").as("self_sq"))
    sums.join(selfs, labelCol)
      .filter(col("n") >= 2)
      .withColumn("mean_pair_dot_milli",
        floor((col("sum_sq") - col("self_sq")).cast("double") * 1000.0 /
          (col("n") * (col("n") - 1))))
      .select(col(labelCol), col("n"), col("sum_sq"), col("self_sq"),
        col("mean_pair_dot_milli"))
  }

  /** Two-stage WINDOW formulation of [[bruteForceTopK]] — the pure-built-in
    * differential oracle. Stage 1 ranks within
    * `(query_id, spark_partition_id())` so no task sorts more than its own
    * partition's candidates; stage 2 ranks the k×P survivors per query.
    * Both stages order by (sim desc, id asc), a total order, so results are
    * identical to the aggregate form (asserted in AnnSpec).
    */
  def bruteForceTopKWindow(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      k: Int = 10): DataFrame = {
    val scored = scoredPairs(corpus, queries, idCol, vecCol)
      // pin the producing partition BEFORE the window shuffle
      .withColumn("__part", spark_partition_id())
    val order = Seq(col("sim_ppm").desc, col("neighbor_id").asc)
    val wLocal = Window.partitionBy("query_id", "__part").orderBy(order: _*)
    val wGlobal = Window.partitionBy("query_id").orderBy(order: _*)
    scored
      .withColumn("__lr", row_number().over(wLocal))
      .filter(col("__lr") <= k) // ≤ k rows per (query, partition) survive
      .withColumn("rank", row_number().over(wGlobal))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "sim_ppm")
  }

  /** Vector dimension: the caller-supplied value when given (> 0), else one
    * probe job reading the first row. Callers on a hot path should pass the
    * dimension (it is a schema-level constant of the embedding table) — the
    * probe is a whole extra Spark job per query build.
    */
  private def resolveDim(df: DataFrame, vecCol: String, dim: Int): Int =
    if (dim > 0) dim else df.select(size(col(vecCol))).first().getInt(0)

  /** Deterministic random hyperplanes: P planes × dim components in [-1, 1],
    * derived from a splitmix64-style integer mix — identical on every run
    * and every engine, no RNG state.
    */
  def planes(numPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] =
    (0 until numPlanes).map { p =>
      (0 until dim).map { i =>
        var z = seed + 0x9e3779b97f4a7c15L * (p.toLong * dim + i + 1)
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        z = z ^ (z >>> 31)
        // map to [-1, 1)
        (z >>> 11).toDouble / (1L << 52).toDouble * 2.0 - 1.0
      }
    }

  /** Sign-bit bucket key for a vector under the given planes. */
  def bucketKey(vec: Column, planeSeq: Seq[Seq[Double]]): Column =
    concat(planeSeq.map { plane =>
      val planeLit = array(plane.map(lit): _*)
      when(dot(vec, planeLit) >= 0.0, lit("1")).otherwise(lit("0"))
    }: _*)

  /** ANN via LSH buckets: candidates share the query's bucket; exact cosine
    * rerank within. Returns same shape as [[bruteForceTopK]] (rank within
    * the candidate set). Recall < 1 by construction; the accompanying spec
    * measures it against brute force.
    *
    * MULTI-PROBE (`probes` > 1): each query also probes the buckets whose
    * sign bit it was closest to flipping — the planes with the smallest
    * |dot| margin — the classical multi-probe LSH recall lever. Single-bit
    * flips only, so at most `numPlanes + 1` buckets exist to probe (the
    * require enforces it rather than silently probing fewer). Cost model
    * at scale: the CORPUS side (the 100 TB side) still lands in exactly one
    * bucket and shuffles once; only the broadcast query side fans out
    * ×probes. Recall climbs without any extra plane tables.
    */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      k: Int = 10,
      numPlanes: Int = 8,
      seed: Long = 42L,
      probes: Int = 1,
      dim: Int = -1): DataFrame = {
    require(probes >= 1 && probes <= numPlanes + 1,
      s"probes must be in [1, numPlanes + 1 = ${numPlanes + 1}]: " +
        "single-bit flips reach exactly numPlanes neighbor buckets")
    val ps = planes(numPlanes, resolveDim(corpus, vecCol, dim), seed)
    val bc = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      norm(col(vecCol)).as("cn"), bucketKey(col(vecCol), ps).as("bucket"))

    // per-query signed margins to every plane, computed once
    val dotsArr = array(ps.map(p =>
      dot(col(vecCol), array(p.map(lit): _*))): _*)
    val qbase = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      norm(col(vecCol)).as("qn"), dotsArr.as("dots"))
    val bucket = concat((0 until numPlanes).map(i =>
      when(element_at(col("dots"), i + 1) >= 0.0, lit("1")).otherwise(lit("0"))): _*)
    val probeBuckets =
      if (probes == 1) array(bucket)
      else {
        // planes sorted by |margin| ascending: cheapest bits to flip first
        val byMargin = array_sort(array((0 until numPlanes).map(i =>
          struct(abs(element_at(col("dots"), i + 1)).as("m"), lit(i).as("i"))): _*))
        val flipIdx = slice(transform(byMargin, s => s.getField("i")), 1, probes - 1)
        def flipAt(b: Column, fi: Column): Column = concat(
          b.substr(lit(1), fi),
          when(b.substr(fi + 1, lit(1)) === "1", lit("0")).otherwise(lit("1")),
          b.substr(fi + 2, lit(numPlanes)))
        concat(array(bucket), transform(flipIdx, fi => flipAt(bucket, fi)))
      }
    // query side is small and broadcast — the ×probes fan-out never touches
    // the corpus; every probe bucket is distinct, so no candidate dedup
    val bq = broadcast(qbase
      .select(col("query_id"), col("qv"), col("qn"),
        explode(probeBuckets).as("bucket")))

    rerankTopK(bc, bq, "bucket", k)
  }

  /** Shared exact-rerank tail for the bucketed ANN variants (LSH cells,
    * IVF cells): join the partitioned corpus to the broadcast probe side on
    * the cell key, score, and rank with the bounded-heap aggregate — NOT a
    * per-query window. A window over bare query_id sorts a query's ENTIRE
    * candidate set (its cell × probes — corpus/#cells rows at scale) in one
    * task, while the TypedImperativeAggregate's partial/final protocol
    * ships at most k entries per (query, map partition). Each neighbor
    * lands in exactly one corpus cell and probe cells are distinct, so no
    * (query, neighbor) pair enters the heap twice.
    */
  private def rerankTopK(
      bc: DataFrame, bq: DataFrame, cellCol: String, k: Int): DataFrame =
    topKTail(
      bc.join(bq, Seq(cellCol))
        .filter(col("neighbor_id") =!= col("query_id"))
        .withColumn("sim_ppm", floor(cosinePrenormed(
          col("qv"), col("cv"), col("qn"), col("cn")) * 1000000.0)),
      k)

  /** Deterministic unit-norm centroids for the IVF coarse quantizer — the
    * same splitmix derivation as [[planes]], normalized ONCE on the driver,
    * so the printed literals (the only form either engine sees) are
    * identical across engines and runs.
    */
  def centroids(numCentroids: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] =
    planes(numCentroids, dim, seed).map { c =>
      val n = math.sqrt(c.map(x => x * x).sum)
      c.map(_ / n)
    }

  /** IVF (inverted-file) ANN: a coarse quantizer of `numCentroids`
    * deterministic unit centroids partitions the corpus into cells (argmax
    * centroid dot — cosine order, since centroids are unit-norm); each
    * query probes its `nProbe` best cells and reranks exactly within them.
    * The classical alternative to hash bucketing: cell population follows
    * the data distribution instead of random sign patterns, and recall is
    * tuned by nProbe alone.
    *
    * Scale shape: identical to [[lshTopK]] — the corpus computes its cell
    * map-side and shuffles once (broadcast here since queries are the small
    * side), the ×nProbe fan-out touches only the broadcast query side, and
    * the rerank is the bounded-heap aggregate. Cell ranking uses
    * `0.0 - dot` ascending (not unary minus: `0.0 - (±0.0) = +0.0` in IEEE,
    * so zero vectors rank cells purely by index in BOTH engines — unary
    * minus would produce -0.0, which Spark's struct sort orders BELOW +0.0
    * while SQL engines compare them equal).
    */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      k: Int = 10,
      numCentroids: Int = 256,
      nProbe: Int = 4,
      seed: Long = 42L,
      dim: Int = -1): DataFrame = {
    require(nProbe >= 1 && nProbe <= numCentroids,
      s"nProbe must be in [1, numCentroids = $numCentroids]")
    val cs = centroids(numCentroids, resolveDim(corpus, vecCol, dim), seed)
    // struct(0.0 - score, index): struct order = best cell first
    def cellStructs(v: Column): Column =
      array(cs.zipWithIndex.map { case (c, i) =>
        struct((lit(0.0) - dot(v, array(c.map(lit): _*))).as("m"), lit(i).as("i"))
      }: _*)
    // corpus side (the 100 TB side) needs only the argmin cell: array_min
    // is O(nc) per row under the same struct total order — the full
    // O(nc log nc) sort runs only on the small broadcast query side, which
    // actually needs the nProbe best cells in order
    val bc = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      norm(col(vecCol)).as("cn"),
      array_min(cellStructs(col(vecCol))).getField("i").as("cell"))
    val bq = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("qv"), norm(col(vecCol)).as("qn"),
      explode(transform(slice(array_sort(cellStructs(col(vecCol))), 1, nProbe),
        s => s.getField("i"))).as("cell")))
    rerankTopK(bc, bq, "cell", k)
  }

  /** Embedding near-duplicate pairs: cosine ≥ threshold within banded LSH
    * buckets — the embedding analog of MinHash LSH. `numPlanes` total sign
    * bits split into `bands` bucket tables (OR-amplification: a pair is a
    * candidate if ANY band agrees on all its numPlanes/bands bits), so
    * per-band bucket count 2^(numPlanes/bands) scales with corpus size and
    * recall scales with bands. Candidate generation shares
    * [[graft.dedup.Dedup.bandedPairs]]: oversized buckets (near-zero or
    * same-direction vector pileups — sign-LSH concentrates both) saturate
    * the size-capped gather's bounded buffer and are dropped by its size
    * filter, so the worst-case quadratic bucket is bounded at `maxBucket`
    * without any buffer ever exceeding maxBucket + 1 entries.
    */
  def cosineNearDupPairs(
      df: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      thresholdPpm: Long = 950000L,
      numPlanes: Int = 16,
      bands: Int = 4,
      seed: Long = 42L,
      maxBucket: Int = 1000,
      dim: Int = -1): DataFrame = {
    require(numPlanes % bands == 0, "numPlanes must divide into bands")
    val r = numPlanes / bands
    val ps = planes(numPlanes, resolveDim(df, vecCol, dim), seed)
    val base = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      norm(col(vecCol)).as("n"))
    // one row per (vector, band); only (id, band_key) shuffles — vectors
    // stay behind and join back for verification only
    val banded = base.select(col("id"),
      explode(array((0 until bands).map(b =>
        concat(lit(s"$b:"), bucketKey(col("v"), ps.slice(b * r, (b + 1) * r)))): _*))
        .as("band_key"))
    graft.dedup.Dedup.bandedPairs(banded, maxBucket)
      .join(base.select(col("id").as("id_a"), col("v").as("v_a"), col("n").as("n_a")), Seq("id_a"))
      .join(base.select(col("id").as("id_b"), col("v").as("v_b"), col("n").as("n_b")), Seq("id_b"))
      .withColumn("sim_ppm", floor(cosinePrenormed(
        col("v_a"), col("v_b"), col("n_a"), col("n_b")) * 1000000.0))
      .filter(col("sim_ppm") >= thresholdPpm)
      .select("id_a", "id_b", "sim_ppm")
  }

  /** Recall@k of an approximate neighbor result against the exact one —
    * THE tuning metric for every ANN variant here (planes/probes/nProbe
    * trade recall for candidate volume; this measures what a setting buys).
    * Per query: hits = |approx ∩ exact|, recall_ppm = hits/|exact| (integer
    * ppm). Queries the approximate index missed entirely (empty bucket)
    * report recall 0, not absence. Both inputs are answer-sized
    * (queries × k rows — the corpus never enters), so the composite-key
    * semi join and the partial+final counts are trivially cheap at any
    * corpus scale; cost lives in producing the inputs.
    *
    * @param approx (query_id, neighbor_id, ...) approximate top-k rows.
    * @param exact  (query_id, neighbor_id, ...) ground-truth top-k rows.
    * @return (query_id, hits, n_true, recall_ppm).
    */
  def recallAtK(approx: DataFrame, exact: DataFrame): DataFrame = {
    val truth = exact.select("query_id", "neighbor_id")
    val hits = truth
      .join(approx.select("query_id", "neighbor_id"),
        Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("hits"))
    truth.groupBy("query_id").agg(count(lit(1)).as("n_true"))
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("hits"), lit(0L)).as("hits"), col("n_true"),
        graft.textops.TextFunctions.ppm(
          coalesce(col("hits"), lit(0L)), col("n_true")).as("recall_ppm"))
  }
}
