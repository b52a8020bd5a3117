package graft.textops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Tokenizer-adjacent corpus operators: frequency-vocabulary fit +
  * re-encode to integer ids, and fixed-budget context chunking. Both are
  * standard stages of a training-data pipeline (vocabulary consolidation
  * before training; context-window layout before batching) re-expressed as
  * Spark plans with the 100 TB shape:
  *
  *  - the vocabulary never routes the corpus through a global window: the
  *    raw token volume collapses through a partial+final `groupBy(word)`
  *    count, and only the AGGREGATED vocabulary reaches the top-K selection
  *    (`orderBy.limit` → Spark's TakeOrderedAndProject — per-partition
  *    heaps, no global sort). Id assignment windows over the ≤K selected
  *    rows only.
  *  - re-encode is a broadcast left join of the exploded corpus against the
  *    ≤K-row vocab: narrow, no corpus shuffle.
  *  - chunking is pure per-row arithmetic (sequence + explode): shuffle-free.
  */
object Vocab {

  /** Fit a frequency vocabulary of the `vocabK` most frequent words
    * (count desc, word asc — a total order) and re-encode every document
    * as (pos, token_id) rows. Ids are dense 0..K-1 in vocabulary order;
    * out-of-vocabulary words encode as -1 (the sentinel a real pipeline
    * maps to UNK).
    *
    * @return (idCol, pos, word, token_id) — one row per token occurrence,
    *         pos 0-based within the document.
    */
  def fitEncode(
      docs: DataFrame,
      vocabK: Int,
      idCol: String = "doc_id"): DataFrame = {
    require(vocabK > 0, s"fitEncode vocabK must be positive, got $vocabK")
    val tok = docs.select(col(idCol),
      posexplode(TextFunctions.words(col("text"))).as(Seq("pos", "word")))
    val counts = tok.groupBy(col("word")).agg(count(lit(1)).as("__n"))
      .orderBy(col("__n").desc, col("word").asc).limit(vocabK)
    // the window ranks ONLY the ≤K selected vocabulary rows (bounded by
    // construction) — never the corpus
    val vocab = counts
      .withColumn("token_id",
        row_number().over(Window.orderBy(col("__n").desc, col("word").asc))
          .cast("long") - 1L)
      .select(col("word"), col("token_id"))
    tok.join(broadcast(vocab), Seq("word"), "left")
      .select(col(idCol), col("pos").cast("long").as("pos"), col("word"),
        coalesce(col("token_id"), lit(-1L)).as("token_id"))
  }

  /** Lay each document's token stream out as fixed-budget context chunks:
    * chunk `i` covers word positions [i·chunkSize, min((i+1)·chunkSize, n)).
    * Documents with zero tokens produce no chunks. Pure narrow arithmetic —
    * `sequence` generates the per-doc chunk indices, `explode` flattens;
    * nothing shuffles.
    *
    * @return (idCol, chunk_id, chunk_len, head_word) — head_word is the
    *         first word of the chunk (the spot-checkable anchor).
    */
  def chunk(
      docs: DataFrame,
      chunkSize: Int,
      idCol: String = "doc_id"): DataFrame = {
    require(chunkSize > 0, s"chunk size must be positive, got $chunkSize")
    val n = size(TextFunctions.words(col("text")))
    docs
      .select(col(idCol), TextFunctions.words(col("text")).as("__ws"),
        n.cast("long").as("__n"))
      .filter(col("__n") > 0)
      .withColumn("chunk_id",
        explode(sequence(lit(0L), expr(s"(__n - 1L) div $chunkSize"))))
      .select(col(idCol), col("chunk_id"),
        least(lit(chunkSize.toLong), col("__n") - col("chunk_id") * chunkSize)
          .as("chunk_len"),
        element_at(col("__ws"), (col("chunk_id") * chunkSize + 1L).cast("int"))
          .as("head_word"))
  }
}
