package graft.ext

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed per-partition in batches.
  *
  * REAL decode lives in [[Media]] (JDK ImageIO for PNG/JPEG, RIFF header
  * parse for WAV — no external jars); this object keeps the
  * format-agnostic plumbing: the canonical media schema, text→payload
  * wrapping for fixtures, BYTE-stride frame sampling (format-blind by
  * design — see [[sampleFrames]]; use [[Media.audioWindows]] for
  * container-aware time windows), and the per-partition imperative hook.
  */
object Multimodal {

  /** Canonical media row: opaque payload + typed metadata (the reference's
    * `Message.data` file-path payloads with `opt` metadata, upgraded to a
    * real schema — SURVEY.md §1.4).
    */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),     // image|audio|video
    StructField("content", BinaryType, nullable = true),    // opaque payload
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true),
      StructField("mime", StringType, nullable = true))), nullable = true)))

  /** Wrap any table into media rows for pipeline testing: bytes of a string
    * column become the opaque payload. Real pipelines read binary files via
    * `spark.read.format("binaryFile")`.
    */
  def fromText(df: DataFrame, idCol: String, textCol: String, kind: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(kind).as("kind"),
      col(textCol).cast("binary").as("content"),
      struct(lit(null).cast("int").as("width"), lit(null).cast("int").as("height"),
        length(col(textCol)).cast("long").as("duration_ms"),
        lit("text/plain").as("mime")).as("meta"))

  /** BYTE-STRIDE frame sampling: split the payload into fixed-size byte
    * windows, one row per sampled window. Format-BLIND by design — this is
    * the explode/stride shape for fixed-frame payloads (raw PCM, fixed-row
    * sensor logs) and for testing downstream batch collation; it does NOT
    * parse any container. For container-aware sampling use
    * [[Media.audioWindows]] (real RIFF/WAV header → time-aligned windows).
    */
  def sampleFrames(df: DataFrame, frameBytes: Int = 64, everyNth: Int = 2): DataFrame =
    df.withColumn("n_frames",
        greatest(ceil(length(col("content")).cast("double") / frameBytes), lit(1)).cast("int"))
      .withColumn("frame_idx",
        explode(filter(sequence(lit(0), col("n_frames") - 1), i => i % everyNth === 0)))
      .withColumn("frame",
        col("content").substr(col("frame_idx") * frameBytes + 1, lit(frameBytes)))
      .drop("content", "n_frames")

  /** Partition-batched imperative hook (the `mapPartitions` escape hatch a
    * JVM codec would use: one codec/connection per partition, not per row —
    * the reference pools clients the same way,
    * `/root/reference/src/Common/HttpRequest.php:40-77`).
    */
  def mapBatches[T](spark: SparkSession, df: DataFrame, schema: StructType)(
      fn: Iterator[Row] => Iterator[Row]): DataFrame =
    spark.createDataFrame(df.rdd.mapPartitions(fn), schema)
}
