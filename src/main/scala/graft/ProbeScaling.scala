package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Scratch diagnostic: why does the broadcast enrichment join not scale? */
object ProbeScaling {
  def main(args: Array[String]): Unit = {
    val workDir = "/root/repo/target/scaling"
    val gen = mk(32, aqe = true)
    val path64 = Synth.materialize(gen, 64000000L, workDir)
    gen.stop()

    for (k <- Seq(32, 8)) {
      val spark = mk(k, aqe = true)
      val lookup = Pipelines.tagLookup(spark)

      def time(name: String, rows: Long)(f: => Unit): Unit = {
        f // warmup
        val ts = (1 to 3).map { _ =>
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }
        println(f"PROBE k=$k $name best=${ts.min}%.3f s thr=${rows / ts.min / 1e6}%.2f M/s")
      }

      val df = spark.read.parquet(path64)
      val plan = Pipelines.flagshipPlan(df)
      val routed = Router.route(df, plan)
      time("B_route", 64000000L)(routed.count())
      time("C_louter", 64000000L)(Router.enrich(routed, lookup).count())
      spark.stop()
    }
  }

  private def mk(cores: Int, aqe: Boolean): SparkSession = {
    val s = SparkSession.builder().master(s"local[$cores]")
      .appName(s"probe-$cores")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
