package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
object Bench {

  /** Bench-only extras: the PRODUCTION (xxhash64) sketch variants and the
    * multi-probe ANN path. The driver's correctness gate runs the md5-family
    * oracle queries in SparkEntry; these keep the fast paths' throughput
    * visible per round (their semantics are pinned by SketchExprSpec
    * differentials, so no oracle entry is owed).
    */
  private def extras: Map[String, (SparkSession, String) => DataFrame] = {
    import org.apache.spark.sql.functions.col
    // SparkEntry's readers, so the fast variants get the same
    // single-row-group spread as the md5 twins they are compared against
    Map(
      "x_dedup_minhash_fast" -> ((s, dir) =>
        graft.dedup.Dedup.minHashLshPairs(SparkEntry.docs(s, dir), thresholdPpm = 400000L)),
      "x_dedup_simhash_fast" -> ((s, dir) =>
        graft.dedup.Dedup.simHashPairs(SparkEntry.docs(s, dir), maxHamming = 12)),
      "x_embed_ann_multiprobe" -> ((s, dir) => {
        val e = SparkEntry.emb(s, dir)
        graft.ann.Ann.lshTopK(e, e.filter(col("vec_id") < 3),
          k = 10, numPlanes = 6, probes = 7, dim = 64)
      }))
  }
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // clamp: reps < 1 would crash median() before ANY result channel emits
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // absorb one-time session costs (JIT, codegen compiler, parquet reader
    // init) so the first timed query is not charged for JVM warmup
    try {
      import org.apache.spark.sql.functions._
      spark.range(1000)
        .filter(col("id").cast("string").rlike("[0-9]"))
        .groupBy(col("id") % 7).count().collect()
      // parquet datasource init is its own one-time cost — touch a tiny table
      spark.read.parquet(s"$sfDir/region.parquet").count()
    } catch { case _: Throwable => }
    // median of `reps` runs per query: single runs at fixed-cost sf scales
    // wobble ±15%, which round-over-round reads as phantom regressions
    def timeOnce(fn: (SparkSession, String) => DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      (System.nanoTime() - t0) / 1e9
    }
    def median(fn: (SparkSession, String) => DataFrame): Double = {
      val ts = (1 to reps).map(_ => timeOnce(fn)).sorted
      ts(ts.length / 2)
    }
    val results = SparkEntry.queries.map { case (name, fn) => name -> median(fn) }
    // bench-only extras live OUTSIDE the headline total: they are not
    // oracled queries, and summing them in would inflate round-over-round
    // total comparisons by three extra jobs
    val extraResults = extras.map { case (name, fn) => name -> median(fn) }
    def obj(m: Map[String, Double]) =
      m.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val json = s"""{"metric":"total","value":$total,"unit":"sec","reps":$reps,""" +
      s""""queries":${obj(results)},"extras":${obj(extraResults)},"sf":"$sfDir"}"""
    // stdout from `sbt runMain` interleaves with Spark/sbt log noise and the
    // round-1 driver failed to parse the line ("parsed": null) — emit the
    // result on every channel a parser might read: bare stdout line, a
    // uniquely-greppable file in the repo, and an env-overridable path.
    println(json)
    System.out.flush()
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      sys.props("user.dir") + "/target/bench_result.json")
    try {
      val p = java.nio.file.Paths.get(outPath)
      if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p, (json + "\n").getBytes("UTF-8"))
    } catch { case _: Throwable => } // file write is best-effort; stdout is primary
    spark.stop()
  }
}
