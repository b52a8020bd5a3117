package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites. ANSI mode stays at the Spark 4
  * default (on) — the engine must be ANSI-safe because the driver's Verify
  * harness runs with defaults.
  */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
