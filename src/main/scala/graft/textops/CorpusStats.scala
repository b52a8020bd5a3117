package graft.textops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level text statistics for training-data curation: repetition
  * signals (the publicly-described Gopher-rule family — "Scaling Language
  * Models" appendix's repetitious-text filters) and per-document salient
  * terms (tf-idf-style keyword extraction).
  *
  * Same contract as the rest of textops: integer/ppm outputs only, no
  * UDFs, every column reproducible bit-exactly by the DuckDB oracle.
  */
object CorpusStats {

  /** Per-document repetition signals over word unigrams and bigrams:
    *
    *  - `dup1_ppm` — fraction of word occurrences that are repeats of an
    *    earlier word, floor-ppm ((n1 - distinct1) / n1);
    *  - `dup2_ppm` — same over adjacent-word bigrams (the strongest
    *    boilerplate/spam signal of the family);
    *  - `top2_ppm` — fraction of bigram occurrences taken by the single
    *    most frequent bigram (loops like "click here click here" light
    *    this up even when overall diversity looks fine).
    *
    * Documents with no words carry no repetition signal and are excluded
    * (a curation gate drops empty docs before this runs anyway); a
    * one-word document has n2 = 0 and zero bigram ratios by the ppm(_, 0)
    * = 0 convention.
    *
    * Shape at scale: one explode of (word ∪ bigram) tokens tagged by kind,
    * then two partial+final aggregates — (doc, kind, token) then (doc).
    * Hot tokens combine map-side; nothing is ever gathered into an
    * unbounded buffer, and no window touches the exploded stream. Token
    * volume is ~2× word count, the same order as any tokenizing scan.
    */
  def repetitionSignals(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val ws = TextFunctions.words(col("text"))
    // one-pass codegen'd bigram strings (wholeIfShort = false reproduces
    // the former `when(size(ws) < 2, array())` guard); the lambda form
    // re-split the text per bigram — O(words²) interpreted
    val bigrams = graft.expressions.ShingleStrings(col("text"), 2,
      wholeIfShort = false, distinct = false)
    val tagged = docs
      .where(length(trim(col("text"))) > 0)
      .select(col(idCol),
        explode(concat(
          transform(ws, w => struct(lit(1).as("kind"), w.as("tok"))),
          transform(bigrams, b => struct(lit(2).as("kind"), b.as("tok"))))).as("t"))
      .select(col(idCol), col("t.kind").as("kind"), col("t.tok").as("tok"))
    val counted = tagged.groupBy(col(idCol), col("kind"), col("tok"))
      .agg(count(lit(1)).as("c"))
    def forKind(k: Int, f: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
      coalesce(f(when(col("kind") === k, col("c"))), lit(0L))
    counted.groupBy(col(idCol))
      .agg(
        forKind(1, sum).as("n1"),
        forKind(1, c => count(c)).as("d1"),
        forKind(1, max).as("top1"),
        forKind(2, sum).as("n2"),
        forKind(2, c => count(c)).as("d2"),
        forKind(2, max).as("top2"))
      .select(col(idCol), col("n1"), col("d1"), col("top1"),
        col("n2"), col("d2"), col("top2"),
        TextFunctions.ppm(col("n1") - col("d1"), col("n1")).cast("long").as("dup1_ppm"),
        TextFunctions.ppm(col("n2") - col("d2"), col("n2")).cast("long").as("dup2_ppm"),
        TextFunctions.ppm(col("top2"), col("n2")).cast("long").as("top2_ppm"))
  }

  /** Top-`k` salient terms per document, ranked by (tf DESC, df ASC, term
    * ASC): the document's own frequent terms, breaking ties toward the
    * corpus-rarest — the tf-idf ORDER without tf-idf's float logarithm.
    * (tf·ln(N/df) ranks identically for fixed tf and monotone df; making
    * the full product integer-exact is impossible, so the lexicographic
    * rank is the honest cross-engine-stable choice and is pinned by the
    * oracle.)
    *
    * Shape at scale: tf is a (doc, term) partial+final aggregate; df
    * aggregates tf's already-distinct (doc, term) pairs by term (vocab
    * cardinality, map-side combined); the df join is vocab-sized (AQE
    * broadcasts it when it fits). The ranking window partitions by doc_id
    * over the document's DISTINCT terms — bounded by per-doc vocabulary,
    * never by corpus size.
    */
  def salientTerms(docs: DataFrame, k: Int, idCol: String = "doc_id"): DataFrame = {
    require(k > 0, s"salientTerms k must be positive, got $k")
    val tf = docs
      .select(col(idCol), explode(TextFunctions.words(col("text"))).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    // bounded per-doc heap aggregate instead of a ranking window: the
    // window shuffles AND SORTS every (doc, term) row; the
    // TypedImperativeAggregate ships ≤ k entries per (doc, map partition)
    // and sorts only its k-element heap — bit-identical results (total
    // order; differential vs the window form in SpanExprSpec)
    tf.join(dfreq, "term")
      .groupBy(col(idCol))
      .agg(graft.expressions.TopKTermsAgg(
        col("tf"), col("df"), col("term"), k).as("__top"))
      .select(col(idCol), posexplode(col("__top")).as(Seq("__pos", "__t")))
      .select(col(idCol), (col("__pos") + 1).cast("long").as("rk"),
        col("__t.term").as("term"), col("__t.tf").as("tf"),
        col("__t.df").as("df"))
  }

  /** Window formulation of [[salientTerms]] — the semantics definition and
    * differential oracle (row_number over the same total order).
    */
  def salientTermsWindow(docs: DataFrame, k: Int, idCol: String = "doc_id"): DataFrame = {
    require(k > 0, s"salientTerms k must be positive, got $k")
    val tf = docs
      .select(col(idCol), explode(TextFunctions.words(col("text"))).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val rank = Window.partitionBy(col(idCol))
      .orderBy(col("tf").desc, col("df").asc, col("term").asc)
    tf.join(dfreq, "term")
      .withColumn("rk", row_number().over(rank).cast("long"))
      .where(col("rk") <= k)
      .select(col(idCol), col("rk"), col("term"), col("tf"), col("df"))
  }

  /** Top-`k` collocations (adjacent word pairs) by LIFT — the PMI ranking
    * without PMI's float logarithm: lift = P(xy)/(P(x)·P(y)) =
    * c_xy·N/(c_x·c_y), and since N is a positive constant the order is
    * c_xy/(c_x·c_y) — ONE IEEE division of exact small integers, bitwise
    * identical in any engine (the counts are also emitted, so the score is
    * reconstructible). `minCount` suppresses the classic lift pathology
    * (two hapax words adjacent once score maximal lift).
    *
    * Shape at scale: bigram and unigram counts are partial+final
    * aggregates; the two count joins are vocab-sized (AQE broadcasts when
    * they fit); the global top-k is `orderBy(...).limit(k)` — Spark plans
    * TakeOrderedAndProject, a bounded per-partition heap + driver merge of
    * ≤ k rows per partition, never a full sort.
    */
  def collocations(docs: DataFrame, minCount: Long, k: Int,
      idCol: String = "doc_id"): DataFrame = {
    require(k > 0 && minCount > 0, s"need k > 0 and minCount > 0, got k=$k minCount=$minCount")
    val ws = TextFunctions.words(col("text"))
    // two-step projection: materialize the word array ONCE per row, then
    // index into the materialized attribute — `element_at(ws, i)` inside
    // the lambda would re-run the full split per pair (O(words²),
    // interpreted). `__ws` is referenced three times below, which stops
    // CollapseProject from inlining the split back into the lambda.
    val pairs = docs
      .where(length(trim(col("text"))) > 0)
      .select(ws.as("__ws"))
      .select(explode(when(size(col("__ws")) < 2,
        array().cast("array<struct<w1:string,w2:string>>"))
        .otherwise(transform(sequence(lit(1), size(col("__ws")) - 1),
          i => struct(element_at(col("__ws"), i).as("w1"),
            element_at(col("__ws"), i + 1).as("w2"))))).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
    val cXY = pairs.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_xy"))
      .where(col("c_xy") >= minCount)
    val uni = docs.where(length(trim(col("text"))) > 0)
      .select(explode(ws).as("w")).groupBy(col("w")).agg(count(lit(1)).as("c"))
    cXY
      .join(uni.select(col("w").as("w1"), col("c").as("c_x")), "w1")
      .join(uni.select(col("w").as("w2"), col("c").as("c_y")), "w2")
      .orderBy((col("c_xy").cast("double") / (col("c_x") * col("c_y"))).desc,
        col("w1").asc, col("w2").asc)
      .limit(k)
      .select(col("w1"), col("w2"), col("c_xy"), col("c_x"), col("c_y"))
  }

  /** Top-`k` frequent terms per group via the bounded Misra-Gries summary
    * ([[graft.expressions.HeavyHittersAgg]], `m` counters): the top-talkers
    * query whose state does NOT scale with vocabulary. `groupBy(term)`
    * materializes every distinct term before ranking — at 100 TB a token/
    * URL/IP vocabulary is billions of rows through the shuffle; here each
    * map task ships ≤ m (term, count) entries per group and the ranking
    * window sees ≤ m rows per group, never the vocabulary.
    *
    * Counts are exact when a group's distinct-term count stays ≤ m (no
    * decrement ever fires — the regime the DuckDB oracle pins); otherwise
    * each count is an underestimate by at most floor(n/(m+1)) and every
    * term with true count above that bound is guaranteed present
    * (property-tested against exact counts).
    */
  /** Percentile rank (exact, integer ppm) of every row's `valueCol` within
    * the whole frame: `pctl_ppm = below * 10^6 div (N - 1)` where `below`
    * counts rows STRICTLY smaller — SQL `percent_rank()` semantics (ties
    * share the min rank) in exact integer arithmetic, so any engine
    * reproduces it bit-for-bit. The quality-calibration primitive: "this
    * document's quality score beats X% of the corpus".
    *
    * Shape at scale: `percent_rank() OVER (ORDER BY value)` would drag the
    * ENTIRE corpus through one global sort in a single task — the worst
    * window Spark can plan. Here the corpus collapses to its value
    * HISTOGRAM first (partial+final count; domain-sized, e.g. quality
    * scores have ~10^3 distinct ppm values), the running "strictly below"
    * sum rides a window over that histogram only, and the per-value ranks
    * join back to the corpus — raw rows are never sorted, never shuffled
    * beyond the count aggregate. The join-back is NULL-SAFE (`<=>`): the
    * histogram groups null values into one bucket exactly like the SQL
    * window ranks them (nulls sort first, sharing rank 0), so null-valued
    * rows keep the window semantics instead of silently dropping. No
    * forced broadcast hint: the ranks frame is distinct-value-sized, which
    * is USUALLY tiny, but a high-cardinality value column must be allowed
    * to fall back to a shuffle join instead of OOMing the driver — AQE
    * broadcasts the common small case on its own measured size.
    */
  def percentileRanks(df: DataFrame, valueCol: String,
      outCol: String = "pctl_ppm"): DataFrame = {
    val w = Window.orderBy(col(valueCol)).rowsBetween(Window.unboundedPreceding, -1)
    val all = Window.partitionBy().rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val ranks = df.groupBy(col(valueCol)).agg(count(lit(1)).as("__n"))
      .withColumn("__below", coalesce(sum(col("__n")).over(w), lit(0L)))
      .withColumn("__total", sum(col("__n")).over(all))
      .select(col(valueCol).as("__rank_v"),
        when(col("__total") > 1,
          expr("__below * 1000000L div (__total - 1)")).otherwise(lit(0L)).as(outCol))
    df.schema(valueCol).dataType match {
      case org.apache.spark.sql.types.LongType |
          org.apache.spark.sql.types.IntegerType |
          org.apache.spark.sql.types.ShortType |
          org.apache.spark.sql.types.ByteType =>
        // sentinel-keyed plain equi-join (the fpKey pattern): nulls map to a
        // reserved Long bucket so the broadcast probe keeps the primitive-
        // long fast path the `<=>` formulation forfeits (Spark rewrites
        // null-safe keys as a 2-key coalesce+isnull join). A REAL
        // Long.MinValue value would merge with the null bucket — the same
        // documented bet fpKey makes; integral score/count domains don't
        // carry it.
        def k(c: org.apache.spark.sql.Column) =
          coalesce(c.cast("long"), lit(Long.MinValue))
        df.join(ranks.withColumn("__rank_k", k(col("__rank_v"))),
          k(col(valueCol)) === col("__rank_k"))
          .drop("__rank_v", "__rank_k")
      case _ =>
        // non-integral value domains keep the null-safe join (no sentinel
        // can be reserved safely)
        df.join(ranks, col(valueCol) <=> col("__rank_v")).drop("__rank_v")
    }
  }

  /** Bounded inverted-index postings: per term, the document frequency
    * `df`, collection frequency `cf`, and the top-`k` postings
    * (doc_id, tf) ranked by (tf desc, doc_id asc) — the retrieval-side
    * artifact a curation pipeline builds to answer "which documents carry
    * this term" without re-scanning the corpus.
    *
    * Shape at scale: one tokenizing explode, then TWO partial+final
    * aggregates — (term, doc) → tf, then (term) → {df, cf, postings}.
    * The postings list is [[graft.expressions.TopKPairsAgg]], a bounded
    * k-element heap per (term, map partition): only ≤ k serialized
    * entries per term per task ever cross the wire, so a stopword whose
    * TRUE postings list is a billion documents still ships k×P rows —
    * the same reason the ANN top-k avoids a window over the corpus. A
    * `collect_list`-then-slice formulation would gather the full postings
    * list into one executor buffer and die exactly on those hot terms.
    * `minDf` prunes hapax noise AFTER aggregation (a plain filter on the
    * aggregated frame — no extra pass).
    */
  def invertedIndex(docs: DataFrame, k: Int, minDf: Long = 1L,
      idCol: String = "doc_id"): DataFrame = {
    require(k > 0 && minDf >= 1, s"need k > 0 and minDf >= 1, got k=$k minDf=$minDf")
    val tf = docs
      .select(col(idCol).cast("long").as("doc_id"),
        explode(TextFunctions.words(col("text"))).as("term"))
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))
    tf.groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"),
        graft.expressions.TopKPairsAgg(col("tf"), col("doc_id"), k).as("post"))
      .where(col("df") >= minDf)
      .select(col("term"), col("df"), col("cf"),
        posexplode(col("post")).as(Seq("pos", "p")))
      .select(col("term"), col("df"), col("cf"),
        (col("pos") + 1).cast("long").as("rank"),
        col("p.neighbor_id").as("doc_id"), col("p.sim_ppm").as("tf"))
  }

  /** Per-document vocabulary coverage against the corpus' own top-`vocabK`
    * terms: token count, out-of-vocabulary count, and exact `oov_ppm` —
    * the tokenizer-fit signal ("how much of this document will a
    * fixed-vocab model see as unknowns").
    *
    * Shape at scale: the vocabulary is `orderBy(count).limit(k)` over the
    * aggregated term counts — Spark plans TakeOrderedAndProject, a k-row
    * heap per partition + driver merge, never a full sort — and then
    * BROADCASTS to the token stream (k rows against billions: the
    * canonical broadcast-left-join). The per-doc rollup is a partial+final
    * aggregate over the exploded tokens; nothing wider than (doc_id, word)
    * ever shuffles. Empty documents vanish with the explode, mirroring the
    * oracle's inner unnest.
    */
  def vocabCoverage(docs: DataFrame, vocabK: Int,
      idCol: String = "doc_id"): DataFrame = {
    require(vocabK > 0, s"vocabCoverage vocabK must be positive, got $vocabK")
    val tok = docs.select(col(idCol), explode(TextFunctions.words(col("text"))).as("w"))
    val vocab = tok.groupBy(col("w")).agg(count(lit(1)).as("__n"))
      .orderBy(col("__n").desc, col("w").asc).limit(vocabK)
      .select(col("w"), lit(1L).as("__in_v"))
    tok.join(broadcast(vocab), Seq("w"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tok"),
        sum(when(col("__in_v").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_ppm", expr("n_oov * 1000000L div n_tok"))
  }

  /** Per-document statistical-fluency signal: the mean corpus frequency of
    * the document's word bigrams, in ppm-scaled integers — natural prose
    * reuses common bigrams, keyboard-mash / boilerplate-fragment text does
    * not, so this is the LM-free stand-in for a perplexity gate. The corpus
    * bigram table comes from a partial+final count of the exploded bigrams;
    * the per-doc lookup is an equi-join keyed on the bigram string (AQE
    * skew-split absorbs stopword-pair hot keys like "of the"), then a
    * per-doc rollup. Everything integer: no float anywhere.
    *
    * @return (idCol, n_bg, sum_freq, mean_freq_ppm) — mean_freq_ppm =
    *         1e6·sum_freq div n_bg (sum of each bigram's corpus count).
    */
  def bigramFluency(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val bg = docs.select(col(idCol),
      explode(TextFunctions.shingles(col("text"), 2)).as("bg"))
    val counts = bg.groupBy(col("bg")).agg(count(lit(1)).as("bg_freq"))
    bg.join(counts, "bg")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bg"), sum("bg_freq").as("sum_freq"))
      .withColumn("mean_freq_ppm", expr("sum_freq * 1000000L div n_bg"))
  }

  /** Per-group distribution drift vs the whole corpus: the two-sample
    * Kolmogorov–Smirnov statistic (max CDF gap) over bucketed values, in
    * integer ppm — the "did this source's length/quality profile shift"
    * monitor. 100 TB shape: the corpus collapses to a (group, bucket)
    * histogram via partial+final counts BEFORE any window; the CDF windows
    * run over the |groups|·|buckets| grid only (bucket count is bounded by
    * construction: value div bucketWidth), and the corpus-wide CDF frame
    * broadcasts to it. Integer-only arithmetic — both engines reproduce
    * every ppm exactly.
    *
    * @return (groupCol, n_docs, ks_ppm) — ks_ppm = max over buckets of
    *         |1e6·cdf_group − 1e6·cdf_corpus|.
    */
  def distributionDrift(
      docs: DataFrame,
      groupCol: String,
      valueCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    // FLOOR division (DuckDB `//` parity): a truncating `div` would fold
    // -w+1..w-1 into one double-width bucket straddling zero for signed
    // value columns
    val bkt = expr(s"CASE WHEN $valueCol >= 0 THEN $valueCol div $bucketWidth " +
      s"ELSE -((-($valueCol) + $bucketWidth - 1) div $bucketWidth) END")
    val hist = docs
      .select(col(groupCol).as("g"), bkt.as("bkt"))
      .groupBy("g", "bkt").agg(count(lit(1)).as("n"))
    val buckets = hist.select("bkt").distinct()
    val groups = hist.groupBy("g").agg(sum("n").as("n_g"))
    // corpus CDF over the bounded bucket grid (the global window ranks
    // |buckets| aggregated rows, never raw docs)
    val all = buckets
      .join(hist.groupBy("bkt").agg(sum("n").as("n_b")), Seq("bkt"), "left")
      .na.fill(0L, Seq("n_b"))
      .withColumn("cum_all", sum("n_b").over(Window.orderBy("bkt")))
    val totAll = hist.agg(sum("n").as("n_all")) // one row
    val grid = groups.crossJoin(broadcast(buckets))
      .join(hist, Seq("g", "bkt"), "left").na.fill(0L, Seq("n"))
      .withColumn("cum_g", sum("n").over(Window.partitionBy("g").orderBy("bkt")))
    grid
      .join(broadcast(all.select("bkt", "cum_all")), Seq("bkt"))
      .crossJoin(broadcast(totAll))
      .withColumn("gap_ppm", abs(
        expr("cum_g * 1000000L div n_g") - expr("cum_all * 1000000L div n_all")))
      .groupBy(col("g").as(groupCol))
      .agg(max("gap_ppm").as("ks_ppm"), first(col("n_g")).as("n_docs"))
      .select(col(groupCol), col("n_docs"), col("ks_ppm"))
  }

  def heavyTerms(docs: DataFrame, groupCol: String, m: Int, k: Int): DataFrame = {
    require(k > 0 && k <= m, s"need 0 < k <= m, got k=$k m=$m")
    val summary = docs
      .select(col(groupCol), explode(TextFunctions.words(col("text"))).as("term"))
      .groupBy(col(groupCol))
      .agg(graft.expressions.HeavyHittersAgg(col("term"), m).as("hh"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("cnt").desc, col("term").asc)
    summary
      .select(col(groupCol), explode(col("hh")).as(Seq("term", "cnt")))
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= k)
      .select(col(groupCol), col("rk"), col("term"), col("cnt"))
  }
}
