package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Optimization-round instrumentation (guide §1.4/§1.5): times individual
  * declared queries through the noop sink (computes every column, no
  * count-driven pruning) and dumps `explain("formatted")` per query.
  * Separate main so [[Bench]] stays byte-frozen for the driver.
  *
  * Usage:
  *   sbt "runMain graft.BenchExtra q_dedup_clusters q_bpe_encode"
  *   sbt "runMain graft.BenchExtra -explain plans/r06 -suffix _before all"
  *   sbt "runMain graft.BenchExtra -reps 5 hot"   # the hot set
  *
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (same contract as Bench).
  */
object BenchExtra {
  private val hotSet = Seq(
    "q_dedup_clusters", "q_curation_neardup", "q_inverted_index",
    "q_bpe_encode", "q_curation", "q_embed_clusters", "q_containment",
    "q_dedup_simhash", "q_incremental_neardup", "q_lm_fluency",
    "q_salient_terms", "q_collocations", "q_embed_neardup", "q_ann_recall",
    "q_dedup_substring", "q_dedup_minhash", "q_label_centroids",
    "q_decontaminate", "q_source_scorecard", "q_quality_pctl")

  def main(args: Array[String]): Unit = {
    var explainDir: Option[String] = None
    var suffix = ""
    var reps = 3
    var useCount = false // Bench's methodology (count) instead of noop
    val names = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "-explain" => explainDir = Some(args(i + 1)); i += 2
        case "-suffix" => suffix = args(i + 1); i += 2
        case "-reps" => reps = args(i + 1).toInt; i += 2
        case "-count" => useCount = true; i += 1
        case "all" => names ++= SparkEntry.queries.keys.toSeq.sorted; i += 1
        case "hot" => names ++= hotSet; i += 1
        case n => names += n; i += 1
      }
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try { // same one-time warmup as Bench
      import org.apache.spark.sql.functions._
      spark.range(1000)
        .filter(col("id").cast("string").rlike("[0-9]"))
        .groupBy(col("id") % 7).count().collect()
      spark.read.parquet(s"$sfDir/region.parquet").count()
    } catch { case _: Throwable => }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val out = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      explainDir.foreach { dir =>
        val p = java.nio.file.Paths.get(dir)
        java.nio.file.Files.createDirectories(p)
        val df = fn(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(p.resolve(s"$name$suffix.txt"),
          txt.getBytes("UTF-8"))
      }
      spark.sparkContext.setJobDescription(name)
      val (t, err) =
        if (useCount) Bench.measure(reps)(() => { fn(spark, sfDir).count(); () })
        else Bench.measure(reps)(() => noop(fn(spark, sfDir)))
      spark.sparkContext.setJobDescription(null)
      err.foreach(e => println(s"ERROR $name: $e"))
      out(name) = t
      println(f"BENCHX $name%-28s $t%8.3f s")
    }
    val json = out.map { case (k, v) => s"\"$k\":$v" }
      .mkString("{\"benchx\":{", ",", s"},\"reps\":$reps}")
    println(json)
    spark.stop()
  }
}
