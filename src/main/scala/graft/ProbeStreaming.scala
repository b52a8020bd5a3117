package graft

import graft.streaming.StreamRouter
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

/** Runnable end-to-end demo of the streaming face: file-source readStream →
  * route (same compiled plan as batch) → exactly-once fan-out file sink,
  * then a second run over the same checkpoint proving no duplication.
  */
object ProbeStreaming {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val work = java.nio.file.Files.createTempDirectory("graft_probe_stream").toString
    // input: synthesized sequence rows as a file-source stream
    Synth.sequences(spark, 5000L).write.parquet(s"$work/in")

    val stream = spark.readStream
      .schema(Synth.sequences(spark, 1L).schema)
      .parquet(s"$work/in")
    val routed = StreamRouter.route(stream, Pipelines.flagshipRules,
      Pipelines.flagshipConfig)

    def runOnce(): Unit = {
      val q = StreamRouter
        .writeFanOut(routed, s"$work/out", s"$work/ckpt", Trigger.AvailableNow())
        .start()
      q.processAllAvailable(); q.stop()
    }
    runOnce()
    val afterFirst = spark.read.parquet(s"$work/out").count()
    runOnce() // same checkpoint, no new input → exactly-once, no duplication
    val afterSecond = spark.read.parquet(s"$work/out").count()

    val sinks = spark.read.parquet(s"$work/out")
      .select("new_label_ns", "new_tag").distinct().collect()
      .map(r => s"${r.getString(0)}/${r.getString(1)}").sorted
    println(s"STREAM_PROBE rows_first=$afterFirst rows_second=$afterSecond " +
      s"sinks=${sinks.mkString(",")} dir=$work")

    // stateful surface: event-time sessionization over a file-source event
    // stream — closed-session aggregates must match the batch operator on
    // the same files (open tails excluded)
    import org.apache.spark.sql.functions._
    val events = graft.sources.ParquetIO
      .read(spark, "/root/testdata/sf0.001/events.parquet")
    events.write.parquet(s"$work/ev_in")
    val evStream = spark.readStream.schema(events.schema).parquet(s"$work/ev_in")
    val sessQ = StreamRouter.sessionize(evStream, gapSeconds = 1800, delay = "10 seconds")
      .writeStream.format("memory").queryName("probe_sessions")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    sessQ.processAllAvailable(); sessQ.stop()
    val streamed = spark.table("probe_sessions")
      .select("user_id", "start_us", "end_us", "n_events", "value_c")
    val batch = graft.logops.LogOps.sessionize(events, gapSeconds = 1800)
      .select("user_id", "start_us", "end_us", "n_events", "value_c")
    val onlyInStream = streamed.exceptAll(batch).count()
    println(s"SESSION_PROBE closed=${streamed.count()} batch=${batch.count()} " +
      s"stream_minus_batch=$onlyInStream")
    spark.stop()
  }
}
