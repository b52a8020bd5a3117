package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, pmod}
object Bench {

  /** Bench-only extras: the PRODUCTION (xxhash64) sketch variants and the
    * multi-probe ANN path. The driver's correctness gate runs the md5-family
    * oracle queries in SparkEntry; these keep the fast paths' throughput
    * visible per round (their semantics are pinned by SketchExprSpec
    * differentials, so no oracle entry is owed).
    */
  private def extras: Map[String, (SparkSession, String) => DataFrame] = {
    // SparkEntry's readers, so the fast variants get the same
    // single-row-group spread as the md5 twins they are compared against
    Map(
      "x_dedup_minhash_fast" -> ((s, dir) =>
        graft.dedup.Dedup.minHashLshPairs(SparkEntry.docs(s, dir), thresholdPpm = 400000L)),
      "x_dedup_simhash_fast" -> ((s, dir) =>
        graft.dedup.Dedup.simHashPairs(SparkEntry.docs(s, dir), maxHamming = 12)),
      "x_incremental_neardup_fast" -> ((s, dir) => {
        val d = SparkEntry.docs(s, dir)
        graft.dedup.Dedup.incrementalNearDupPairsFast(
          d.filter(pmod(col("doc_id"), lit(3)) === 0),
          d.filter(pmod(col("doc_id"), lit(3)) =!= 0),
          thresholdPpm = 400000L)
      }),
      "x_embed_ann_multiprobe" -> ((s, dir) => {
        val e = SparkEntry.emb(s, dir)
        graft.ann.Ann.lshTopK(e, e.filter(col("vec_id") < 3),
          k = 10, numPlanes = 6, probes = 7, dim = 64)
      }))
  }
  /** One untimed warm-up run, then the median of `reps` timed runs — or
    * (-1, the first failure message) if any run throws: a failure must
    * surface in the bench JSON as an error, never as a (suspiciously fast)
    * timing. The per-query warm-up is load-bearing for comparability: each
    * query's first execution pays its own codegen+JIT (measured 5.7 s →
    * 1.3 s steady state for the md5-minhash plan), so without it a query's
    * median depends on where map ordering happened to place it — adding an
    * unrelated query would read as a phantom regression elsewhere.
    */
  private[graft] def measure(reps: Int)(run: () => Unit): (Double, Option[String]) = {
    val times = Vector.newBuilder[Double]
    var i = 0
    while (i <= reps) {
      val t0 = System.nanoTime()
      try { run(); times += (System.nanoTime() - t0) / 1e9 }
      catch {
        case t: Throwable =>
          // first failure wins and ends the query: re-running a
          // known-broken (possibly slow-to-fail) query reps more times
          // buys nothing
          return (-1.0, Some(t.getClass.getSimpleName + ": " +
            Option(t.getMessage).getOrElse("").linesIterator.take(1)
              .mkString.take(160)))
      }
      i += 1
    }
    val ts = times.result().drop(1).sorted // drop the warm-up run
    (ts(ts.length / 2), None)
  }

  private[graft] def escJson(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
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
    def median(fn: (SparkSession, String) => DataFrame): (Double, Option[String]) =
      measure(reps)(() => fn(spark, sfDir).count())
    val results = SparkEntry.queries.map { case (name, fn) => name -> median(fn) }
    // bench-only extras live OUTSIDE the headline total: they are not
    // oracled queries, and summing them in would inflate round-over-round
    // total comparisons by three extra jobs
    val extraResults = extras.map { case (name, fn) => name -> median(fn) }
    def obj(m: Map[String, (Double, Option[String])]) =
      m.map { case (k, (v, _)) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    // a failing query must be LOUD: value -1 in "queries" plus its message
    // here — a broken query must never fold a fast failure into the median
    // as if it were a fast success
    def errObj(ms: Map[String, (Double, Option[String])]) =
      ms.collect { case (k, (_, Some(e))) => s"\"$k\":\"${escJson(e)}\"" }
        .mkString("{", ",", "}")
    val allErrs = errObj(results ++ extraResults)
    val total = results.values.collect { case (v, None) => v }.sum
    val json = s"""{"metric":"total","value":$total,"unit":"sec","reps":$reps,""" +
      s""""queries":${obj(results)},"extras":${obj(extraResults)},""" +
      s""""errors":$allErrs,"sf":"$sfDir"}"""
    // SHORT headline first: the 86-query map makes the full line ~4 KB, and
    // a bounded tail/head capture that starts or ends mid-line sees no
    // complete JSON object (round-4 driver read "parsed": null for exactly
    // this reason). The headline carries the decision-grade fields
    // (total/reps/errors) in <200 bytes and is printed BEFORE and AFTER the
    // full map, so any contiguous capture window containing either edge of
    // the output holds one complete object.
    val headline = s"""{"metric":"total","value":$total,"unit":"sec",""" +
      s""""reps":$reps,"errors":$allErrs,"sf":"$sfDir"}"""
    println(headline)
    // stdout from `sbt runMain` interleaves with Spark/sbt log noise and the
    // round-1 driver failed to parse the line ("parsed": null) — emit the
    // result on every channel a parser might read: bare stdout line, a
    // uniquely-greppable file in the repo, and an env-overridable path.
    println(json)
    println(headline)
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
