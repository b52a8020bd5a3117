package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Observation, SparkSession}

/** Scratch diagnostic: which stage limits N→4N scaling? */
object ProbeScaling {
  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("SPARK_GRAFT_SCALE_ROWS", "40000000").toLong
    val workDir = "/root/repo/target/scaling"
    val gen = mk(32)
    val path = Synth.materialize(gen, rows, workDir)
    gen.stop()

    for (k <- Seq(8, 32)) {
      val spark = mk(k)
      val df = spark.read.parquet(path)
      val plan = Pipelines.flagshipPlan(df)
      val lookup = Pipelines.tagLookup(spark)

      def time(name: String)(f: => Unit): Unit = {
        f // warmup
        val ts = (1 to 3).map { _ =>
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }
        println(f"PROBE k=$k $name best=${ts.min}%.3f s thr=${rows / ts.min / 1e6}%.2f M/s")
      }

      time("scan_count")(df.select("source").count())
      time("scan_rlike")(df.filter(col("source").rlike("^td\\.apache\\..+$")).count())
      time("route_agg_parquet") {
        Router.sinkCounts(Router.enrich(Router.route(df, plan), lookup)).collect()
      }
      val mem = Synth.sequences(spark, rows).select("doc_id", "source")
      val planMem = RuleCompiler.compile(
        Pipelines.flagshipRules, Pipelines.flagshipConfig, mem.schema, "source")
      time("route_agg_inmem") {
        Router.sinkCounts(Router.enrich(Router.route(mem, planMem), lookup)).collect()
      }
      spark.stop()
    }
  }

  private def mk(cores: Int): SparkSession = {
    val s = SparkSession.builder().master(s"local[$cores]")
      .appName(s"probe-$cores")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
