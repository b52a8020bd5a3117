package graft

import org.apache.spark.sql.SparkSession

/** Scratch diagnostic: print the flagship physical plan to count how many
  * times the fused cascade (tag_rewrite) is evaluated per row.
  */
object ProbeExplain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = Synth.sequences(spark, 1000L)
    val plan = Pipelines.flagshipPlan(df)
    val full = Router.sinkCounts(
      Router.enrich(Router.route(df, plan), Pipelines.tagLookup(spark)))
    full.explain("formatted")
    val s = full.queryExecution.executedPlan.toString
    println("tag_rewrite occurrences in executed plan: " +
      "tag_rewrite".r.findAllIn(s).length)
    spark.stop()
  }
}
