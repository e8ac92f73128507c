package graft.ext

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed per-partition in batches.
  *
  * The decode step is STUBBED (this container has no image/audio codecs —
  * see the builder brief): [[decodeStub]] derives deterministic fake
  * features from the bytes. Everything around it — the media schema, the
  * partition-batched execution shape, feature arrays — is real Spark
  * plumbing a codec-backed implementation would drop into unchanged.
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

  /** STUB decoder: in place of a codec, derive a deterministic fixed-length
    * feature vector from the payload bytes — per feature i, the top 24 bits
    * of md5(content ‖ i) scaled to [0,1). Signature and batch shape match
    * what a real decoder (image resize + CNN features, audio frames) would
    * produce. md5 (not xxhash64) so the exact values are reproducible in any
    * engine for oracle comparison; 24 bits / 2^24 is exact in a double.
    */
  def decodeStub(df: DataFrame, featureDim: Int = 8): DataFrame =
    df.withColumn("features",
      transform(sequence(lit(0), lit(featureDim - 1)), i =>
        conv(substring(md5(concat(col("content"), i.cast("string").cast("binary"))), 1, 6),
          16, 10).cast("double") / lit((1 << 24).toDouble)))

  /** Frame-sampling shape for video/audio: split the payload into
    * fixed-size windows (frames), one row per sampled frame — the explode
    * pattern a real frame sampler uses, with deterministic fake frames.
    */
  def sampleFrames(df: DataFrame, frameBytes: Int = 64, everyNth: Int = 2): DataFrame =
    df.withColumn("n_frames",
        greatest(ceil(length(col("content")).cast("double") / frameBytes), lit(1)).cast("int"))
      .withColumn("frame_idx",
        explode(filter(sequence(lit(0), col("n_frames") - 1), i => i % everyNth === 0)))
      .withColumn("frame",
        col("content").substr(col("frame_idx") * frameBytes + 1, lit(frameBytes)))
      .drop("content", "n_frames")

  /** STUB resize: normalize every payload to exactly `targetBytes`
    * (`rpad` truncates long payloads and space-pads short ones) and
    * stamp the meta width/height to the target box. Stands in for an image
    * resize the way [[decodeStub]] stands in for a decoder: a real
    * implementation swaps the byte-level transform for a codec call inside
    * the same single-pass projection — the schema contract (fixed-size
    * content + updated meta) is what downstream batch collation relies on.
    */
  def resizeStub(df: DataFrame, targetBytes: Int, targetW: Int = 224,
                 targetH: Int = 224): DataFrame = {
    require(targetBytes > 0)
    df.withColumn("content",
        rpad(col("content").cast("string"), targetBytes, " ").cast("binary"))
      .withColumn("meta", struct(
        lit(targetW).as("width"), lit(targetH).as("height"),
        col("meta.duration_ms").as("duration_ms"), col("meta.mime").as("mime")))
  }

  /** Partition-batched imperative hook (the `mapPartitions` escape hatch a
    * JVM codec would use: one codec/connection per partition, not per row —
    * the reference pools clients the same way,
    * `/root/reference/src/Common/HttpRequest.php:40-77`).
    */
  def mapBatches[T](spark: SparkSession, df: DataFrame, schema: StructType)(
      fn: Iterator[Row] => Iterator[Row]): DataFrame =
    spark.createDataFrame(df.rdd.mapPartitions(fn), schema)
}
