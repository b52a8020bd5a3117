package graft

import org.apache.spark.sql.{Observation, SparkSession}

/** Two-parallelism-level scaling evidence for the north rule: the same
  * flagship parse→route→enrich→aggregate job, identical on-disk input, run
  * at local[N] and local[4N] (the sandbox proxy for N vs 4N executors —
  * BASELINE.md protocol). Reports rows/sec at both levels and the scaling
  * efficiency (throughput_4N / throughput_N) / 4, required ≥ 0.8.
  *
  * Method notes:
  *  - input is materialized to parquet once and re-read (generation cost
  *    excluded; OS page cache removes disk-read variance after warm-up);
  *  - one warm-up run per level (JIT + codegen), then `reps` timed runs,
  *    best-of taken (steady-state throughput, robust to GC hiccups);
  *  - the timed job is the aggregate pipeline (route → broadcast enrich →
  *    per-sink counts) — all CPU-bound regex/codegen work, one partial+final
  *    hash-agg shuffle, mirroring the north rule's "parse→route→aggregate".
  */
object ScalingBench {

  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("SPARK_GRAFT_SCALE_ROWS", "4000000").toLong
    val small = sys.env.getOrElse("SPARK_GRAFT_SCALE_N", "8").toInt
    val big = 4 * small
    // best-of-5: single-session 32-core runs show ±10% wall-time noise
    // (host tenancy, GC timing); the max-throughput window is the honest
    // steady-state figure and stabilizes the efficiency ratio
    val reps = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPS", "5").toInt
    val workDir = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR",
      "/root/repo/target/scaling")

    // materialize input once (its own session, excluded from timing)
    val genSession = session(big)
    val inputPath = Synth.materialize(genSession, rows, workDir)
    genSession.stop()

    val results = Seq(small, big).map { k =>
      val spark = session(k)
      val df = spark.read.parquet(inputPath)
      val plan = Pipelines.flagshipPlan(df)
      val lookup = Pipelines.tagLookup(spark)

      def once(): (Double, Long) = {
        val obs = Observation()
        val t0 = System.nanoTime()
        Router.enrichCounts(
          Router.sinkCounts(Router.routeObserved(df, plan, obs)), lookup).collect()
        val sec = (System.nanoTime() - t0) / 1e9
        (sec, obs.get("emitted").asInstanceOf[Long])
      }

      once() // warm-up (JIT + codegen + page cache)
      val runs = (1 to reps).map(_ => once())
      val (bestSec, emitted) = runs.minBy(_._1)
      spark.stop()
      (k, bestSec, emitted, emitted / bestSec)
    }

    val Seq((k1, s1, n1, t1), (k2, s2, _, t2)) = results
    val eff = (t2 / t1) / (k2.toDouble / k1)
    println(
      s"""{"metric":"scaling_efficiency","value":${f"$eff%.3f"},"unit":"ratio",""" +
        s""""rows":$n1,"levels":{"local[$k1]":{"sec":${f"$s1%.3f"},"rows_per_sec":${t1.toLong}},""" +
        s""""local[$k2]":{"sec":${f"$s2%.3f"},"rows_per_sec":${t2.toLong}}},""" +
        s""""requirement":"efficiency >= 0.8"}""")
  }

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-scaling-$cores")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
