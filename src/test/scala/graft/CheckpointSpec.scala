package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

class CheckpointSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("resumable run: kill after 2 of 4 ranges, resume, idempotent totals") {
    val inDir = Files.createTempDirectory("graft-ckpt-in").toString
    val outDir = Files.createTempDirectory("graft-ckpt-out").toString
    Synth.sequences(spark, 4000).repartition(8)
      .write.mode("overwrite").parquet(inDir)

    val df = spark.read.parquet(inDir)
    val plan = Pipelines.flagshipPlan(df)
    val lookup = Some(Pipelines.tagLookup(spark))

    // direct, non-checkpointed reference totals
    val want = Router.sinkCounts(
      Router.enrich(Router.route(df, plan), Pipelines.tagLookup(spark)))
      .collect().map(r => s"${r.getString(0)}/${r.getString(1)}" -> r.getLong(2)).toMap

    // first run "crashes" after 2 ranges
    val run1 = Checkpoint.runResumable(spark, inDir, outDir, plan, lookup,
      numRanges = 4, maxRangesThisRun = 2)
    assert(run1.processed == 2)

    // resume completes only the remaining ranges
    val run2 = Checkpoint.runResumable(spark, inDir, outDir, plan, lookup, numRanges = 4)
    assert(run2.processed == 2 && run2.skipped == 2)
    assert(run2.totalSinkCounts == want)

    // third run is a full no-op, totals stable (manifest round-trip)
    val run3 = Checkpoint.runResumable(spark, inDir, outDir, plan, lookup, numRanges = 4)
    assert(run3.processed == 0 && run3.skipped == 4)
    assert(run3.totalSinkCounts == want)

    // rule change invalidates all manifests
    val plan2 = RuleCompiler.compile(
      Pipelines.flagshipRules.take(6), Pipelines.flagshipConfig, df.schema, "source")
    val run4 = Checkpoint.runResumable(spark, inDir, outDir, plan2, lookup,
      numRanges = 4, maxRangesThisRun = 0)
    assert(run4.processed == 0 && run4.ranges.forall(_.skipped)) // all pending, none run
    val run5 = Checkpoint.runResumable(spark, inDir, outDir, plan2, lookup, numRanges = 4)
    assert(run5.processed == 4)
  }
}
