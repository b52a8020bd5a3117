package graft.multimodal

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, plus decode / feature-extract /
  * frame-sample stages.
  *
  * The Spark-side plumbing (schema, partitioning, batched per-partition
  * processing, output shape) is real and tested; the actual codec step is a
  * STUB — this container has no image/audio libraries — implemented as a
  * deterministic fake so tests are exact. Swapping `decodeStub` for a real
  * JNI/javacv decoder changes no plumbing.
  */
object Multimodal {

  /** Typed media row: payload + metadata travel together. */
  final case class MediaRow(
      doc_id: String,
      media: Array[Byte],
      media_type: String,
      n_bytes: Long)

  final case class MediaFeatures(
      doc_id: String,
      media_type: String,
      feature: Array[Float],
      n_frames: Int)

  /** Derive a media table from a text corpus: the UTF-8 bytes stand in for
    * an opaque payload; media_type assigned deterministically. Real
    * pipelines read `binaryFile` sources into exactly this shape.
    */
  def fromDocuments(df: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    df.select(
      col(idCol).cast("string").as("doc_id"),
      encode(col(textCol), "UTF-8").as("media"),
      element_at(
        array(lit("image"), lit("audio"), lit("video")),
        (pmod(crc32(encode(col(textCol), "UTF-8")), lit(3)) + 1).cast("int")).as("media_type"),
      octet_length(encode(col(textCol), "UTF-8")).cast("long").as("n_bytes"))

  /** Columnar metadata extraction — pure expressions over the binary
    * payload (what a header-sniff would yield; here derived from CRC for
    * determinism).
    */
  def withMetadata(media: DataFrame): DataFrame =
    media
      .withColumn("width", (lit(160) + pmod(crc32(col("media")), lit(1280))).cast("int"))
      .withColumn("height", (lit(120) + pmod(crc32(reverse(col("media"))), lit(720))).cast("int"))
      .withColumn("duration_ms",
        when(col("media_type") === "image", lit(0L))
          .otherwise(col("n_bytes") * 40L))

  /** Frame sampling: every k-th byte-slice of the payload as a "frame"
    * (array<binary>), via a SQL lambda — shows the real slicing plumbing
    * (uniform temporal sampling) over binary data.
    */
  def sampleFrames(media: DataFrame, nFrames: Int = 4, frameLen: Int = 16): DataFrame =
    media.withColumn("frames",
      expr(s"transform(sequence(0, $nFrames - 1), " +
        s"i -> substring(media, 1 + i * int(greatest(n_bytes div $nFrames, 1)), $frameLen))"))

  /** Batched per-partition decode + feature extraction — the Scala analog
    * of `mapInPandas`: rows stream through in fixed-size batches (the shape
    * a vectorized codec wants), one decoder instance per partition (the
    * expensive init happens once per task, not once per row).
    */
  def decodeFeatures(
      spark: SparkSession,
      media: DataFrame,
      batchSize: Int = 64,
      featureDim: Int = 8): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select("doc_id", "media", "media_type", "n_bytes").as[MediaRow]
      .mapPartitions { it =>
        // per-partition "decoder" init would go here (e.g. codec handles)
        it.grouped(batchSize).flatMap { batch =>
          batch.map { row =>
            MediaFeatures(
              row.doc_id,
              row.media_type,
              decodeStub(row.media, featureDim),
              n_frames = math.max(1, (row.n_bytes / 1024L).toInt))
          }
        }
      }
  }

  /** STUB decode: a real implementation would decode the payload with an
    * image/audio codec and run a feature extractor. Deterministic fake:
    * FNV-1a over the bytes re-seeded per dimension, mapped into [0, 1).
    */
  private[multimodal] def decodeStub(bytes: Array[Byte], dim: Int): Array[Float] = {
    val base = graft.expressions.FnvHash64.hash(bytes)
    Array.tabulate(dim) { i =>
      val mixed = java.lang.Long.rotateLeft(base, i * 7) * 0x9e3779b97f4a7c15L
      ((mixed >>> 40).toFloat / (1 << 24).toFloat)
    }
  }
}
