package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table I/O abstraction: the production target is Iceberg (north rule:
  * "Iceberg table of pre-tokenized training sequences", one Iceberg sink per
  * rewritten tag, snapshot-id lineage), but this sandbox ships no
  * iceberg-spark-runtime jar (/opt/spark/jars has none and the offline
  * coursier cache cannot resolve one — SURVEY.md §7.6). The engine therefore
  * talks to a `TableIO` trait: [[ParquetIO]] is fully exercised here and in
  * CI; [[IcebergIO]] compiles against the same Spark surface (format
  * strings + SQL) and carries the snapshot-id lineage the Checkpoint
  * manifests record, to be exercised where the runtime jar exists.
  */
trait TableIO {

  /** Read a table (path for parquet; catalog identifier for Iceberg). */
  def read(spark: SparkSession, table: String): DataFrame

  /** Fan-out write: one partition directory / Iceberg partition per
    * (label-namespace, tag) under `sink`.
    */
  def writeFanOut(routed: DataFrame, sink: String, maxRecordsPerFile: Long): Unit

  /** Lineage id of the table's current version: Iceberg snapshot-id, or a
    * content fingerprint under parquet (Checkpoint manifests store it as
    * `input_fingerprint`).
    */
  def versionId(spark: SparkSession, table: String): String
}

/** Parquet directories — the sandbox/CI implementation. */
object ParquetIO extends TableIO {

  override def read(spark: SparkSession, table: String): DataFrame =
    spark.read.parquet(table)

  override def writeFanOut(
      routed: DataFrame, sink: String, maxRecordsPerFile: Long): Unit =
    graft.Router.writeFanOut(routed, sink, maxRecordsPerFile = maxRecordsPerFile)

  /** Content fingerprint over (file name, size) — what Checkpoint uses. */
  override def versionId(spark: SparkSession, table: String): String = {
    val files = Option(new java.io.File(table).listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
    graft.Checkpoint.filesFingerprint(files.toSeq)
  }
}

/** Iceberg catalog tables — same Spark API surface, requires
  * iceberg-spark-runtime on the classpath plus a configured catalog
  * (`spark.sql.catalog.<name>`). Kept format-string-only so this module
  * compiles without the jar; exercised on clusters that ship it.
  */
final class IcebergIO(catalog: String) extends TableIO {

  override def read(spark: SparkSession, table: String): DataFrame =
    spark.read.format("iceberg").load(s"$catalog.$table")

  override def writeFanOut(
      routed: DataFrame, sink: String, maxRecordsPerFile: Long): Unit = {
    import org.apache.spark.sql.functions._
    routed
      .withColumn("new_label_ns",
        coalesce(col(graft.Router.NewLabel), lit(graft.Router.DefaultLabel)))
      .drop(graft.Router.NewLabel)
      .writeTo(s"$catalog.$sink")
      .partitionedBy(col("new_label_ns"), col(graft.Router.NewTag))
      .createOrReplace()
  }

  /** Current snapshot id from the Iceberg metadata table. */
  override def versionId(spark: SparkSession, table: String): String =
    spark.sql(
      s"SELECT snapshot_id FROM $catalog.$table.snapshots " +
        "ORDER BY committed_at DESC LIMIT 1")
      .collect().headOption.map(_.get(0).toString).getOrElse("none")
}
