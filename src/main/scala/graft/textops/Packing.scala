package graft.textops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: lay documents end-to-end into fixed token-budget
  * training sequences — the step that turns a curated corpus into the
  * contiguous token stream an LLM pre-training job actually reads
  * (publicly described in the GPT/T5 data pipelines as "concat and chunk").
  *
  * A single global concatenation order is a scalability dead end (one
  * worker would own the cumulative sum of the whole corpus), and no real
  * pipeline uses one: corpora are packed per SHARD, where a shard is a
  * deterministic hash-slice of the corpus sized so shards ≫ executors.
  * That is exactly what this operator does:
  *
  *  - `shard` = doc_id mod `shards` — deterministic, engine-independent,
  *    and uniform for synthetic ids; a production caller with clustered
  *    ids passes a hash-bucketed column instead;
  *  - within a shard, docs are laid out in (doc_id) order; `start_off` is
  *    the running token offset BEFORE the doc (exclusive prefix sum) and
  *    `pack_id` = start_off div budget — the training sequence whose
  *    window the doc's first token lands in (docs may straddle a pack
  *    boundary; "pack then split" is the standard layout, the reader
  *    slices at exact budget multiples downstream).
  *
  * Shape at scale: one exchange on `shard` feeds a running-frame window
  * (O(1) state per row — an exclusive prefix sum, no buffering); every
  * output column is an exact integer, so the DuckDB oracle reproduces the
  * layout bit-for-bit. With shards ≈ 4× cluster cores, the per-shard sort
  * is the same work profile as any keyed window at 100 TB.
  */
object Packing {

  def packSequences(
      docs: DataFrame,
      budget: Long,
      shards: Int,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(budget > 0, s"packSequences budget must be positive, got $budget")
    require(shards > 0, s"packSequences shards must be positive, got $shards")
    val perShard = Window.partitionBy(col("shard"))
      .orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(col(idCol),
        pmod(col(idCol), lit(shards.toLong)).cast("long").as("shard"),
        TextFunctions.tokenCountWs(col(textCol)).cast("long").as("n_tokens"))
      .withColumn("start_off",
        coalesce(sum(col("n_tokens")).over(perShard), lit(0L)))
      // `div` is exact long division (≡ DuckDB's `//`) — no IEEE rounding
      .withColumn("pack_id", expr(s"start_off div ${budget}L"))
  }
}
