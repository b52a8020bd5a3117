package graft

import graft.sources.ParquetIO
import org.scalatest.funsuite.AnyFunSuite

/** ParquetIO (the sandbox TableIO implementation): read/fan-out round trip
  * and a content-addressed version id that moves when the data moves.
  */
class TableIOSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("round trip: read → route → fan-out write; versionId tracks content") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tableio").toString
    Synth.sequences(spark, 500L).write.parquet(s"$dir/in")

    val df = ParquetIO.read(spark, s"$dir/in")
    assert(df.count() == 500)
    val v1 = ParquetIO.versionId(spark, s"$dir/in")

    val routed = Router.route(df, Pipelines.flagshipPlan(df))
    ParquetIO.writeFanOut(routed, s"$dir/out", maxRecordsPerFile = 1000L)
    val out = spark.read.parquet(s"$dir/out")
    assert(out.count() == routed.count())
    assert(out.columns.contains("new_label_ns") && out.columns.contains("new_tag"))

    // version id is content-addressed: more data → different id
    Synth.sequences(spark, 600L).write.mode("overwrite").parquet(s"$dir/in")
    val v2 = ParquetIO.versionId(spark, s"$dir/in")
    assert(v1 != v2)

    // PARTITIONED layouts fingerprint their nested data files (a top-level
    // listing would hash every partitioned table to the empty-list value)
    val vOut1 = ParquetIO.versionId(spark, s"$dir/out")
    assert(vOut1 != ParquetIO.versionId(spark, s"$dir/in"))
    ParquetIO.writeFanOut(
      Router.route(ParquetIO.read(spark, s"$dir/in"),
        Pipelines.flagshipPlan(ParquetIO.read(spark, s"$dir/in"))),
      s"$dir/out2", maxRecordsPerFile = 1000L)
    assert(ParquetIO.versionId(spark, s"$dir/out2") != vOut1) // 600 ≠ 500 rows
  }
}
