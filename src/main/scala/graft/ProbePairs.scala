package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-6 probe: isolate the in-row pair-expansion cost on the actual
  * containment span buckets (the one query family where UnorderedPairs
  * A/B-measured slower than the nested-lambda form it replaced).
  * Not part of any declared query.
  */
object ProbePairs {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .repartition(spark.sparkContext.defaultParallelism)
    // containment's bucket table: distinct (doc_id, span_fp), k=8
    val spans = docs.select(col("doc_id"),
      explode(graft.dedup.Dedup.spanFps(col("text"), 8)).as("span_fp"))
      .distinct()
    val buckets = spans
      .groupBy("span_fp")
      .agg(graft.expressions.CappedCollectList(col("doc_id"), 65).as("ids"))
      .filter(size(col("ids")).between(2, 64))
      .localCheckpoint() // isolate: expansion cost only, input materialized
    println(s"buckets: ${buckets.count()}")
    buckets.select(size(col("ids")).as("n")).groupBy("n").count()
      .orderBy(col("n")).collect()
      .foreach(r => println(s"  bucket_size=${r.get(0)} count=${r.get(1)}"))

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val newForm = () => noop(buckets
      .select(explode(graft.expressions.UnorderedPairs(col("ids"))).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("c")))
    val oldForm = () => noop(buckets
      .select(explode(flatten(transform(col("ids"), x =>
        transform(filter(col("ids"), y => y > x),
          y => struct(x.as("id_a"), y.as("id_b")))))).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("c")))
    // interleaved reps so JIT/GC drift hits both forms equally
    val reps = 7
    val tNew = new Array[Double](reps)
    val tOld = new Array[Double](reps)
    for (r <- 0 until reps) {
      var t0 = System.nanoTime(); newForm(); tNew(r) = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime(); oldForm(); tOld(r) = (System.nanoTime() - t0) / 1e9
    }
    def med(a: Array[Double]) = a.sorted.apply(a.length / 2)
    println(f"PAIRS new=${med(tNew)}%.3f s  old=${med(tOld)}%.3f s  " +
      s"(all new=${tNew.map(t => f"$t%.3f").mkString(",")} " +
      s"old=${tOld.map(t => f"$t%.3f").mkString(",")})")

    // full-query twin: containmentPairs as shipped (UnorderedPairs) vs an
    // in-place lambda-form rebuild, interleaved in the SAME session so the
    // host's session-to-session DRAM bimodality cancels
    val fullNew = () => noop(graft.dedup.Dedup.containmentPairs(docs))
    val fullOld = () => {
      val docSpans = docs.select(col("doc_id"),
        explode(graft.dedup.Dedup.spanFps(col("text"), 8)).as("span_fp"))
        .distinct()
      val nSpans = docSpans.groupBy("doc_id").agg(count(lit(1)).as("n_spans"))
      val shared = docSpans
        .groupBy("span_fp")
        .agg(graft.expressions.CappedCollectList(col("doc_id"), 65).as("ids"))
        .filter(size(col("ids")).between(2, 64))
        .select(explode(flatten(transform(col("ids"), x =>
          transform(filter(col("ids"), y => y > x),
            y => struct(x.as("id_a"), y.as("id_b")))))).as("p"))
        .select(col("p.id_a"), col("p.id_b"))
        .groupBy("id_a", "id_b")
        .agg(count(lit(1)).as("shared_spans"))
        .filter(col("shared_spans") >= 2)
      noop(shared
        .join(nSpans.select(col("doc_id").as("id_a"), col("n_spans").as("n_spans_a")), Seq("id_a"))
        .join(nSpans.select(col("doc_id").as("id_b"), col("n_spans").as("n_spans_b")), Seq("id_b"))
        .withColumn("containment_ppm",
          expr("shared_spans * 1000000L div least(n_spans_a, n_spans_b)"))
        .select("id_a", "id_b", "shared_spans", "containment_ppm"))
    }
    val fNew = new Array[Double](reps)
    val fOld = new Array[Double](reps)
    for (r <- 0 until reps) {
      var t0 = System.nanoTime(); fullNew(); fNew(r) = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime(); fullOld(); fOld(r) = (System.nanoTime() - t0) / 1e9
    }
    println(f"FULL new=${med(fNew)}%.3f s  old=${med(fOld)}%.3f s  " +
      s"(all new=${fNew.map(t => f"$t%.3f").mkString(",")} " +
      s"old=${fOld.map(t => f"$t%.3f").mkString(",")})")

    // does AQE stage-reuse collapse the two identical nSpans subtrees at
    // runtime (the initial plan shows 3 corpus-wide md5_span_fps passes)?
    val cp = graft.dedup.Dedup.containmentPairs(docs)
    cp.collect()
    val finalPlan = cp.queryExecution.executedPlan.toString
    val nSpanPasses = "md5_span_fps".r.findAllIn(finalPlan).length
    println(s"CONTAINMENT_FINAL_PLAN reused=${finalPlan.contains("ReusedExchange") || finalPlan.contains("ReusedQueryStage")} md5_span_fps_sites=$nSpanPasses")
    spark.stop()
  }
}
