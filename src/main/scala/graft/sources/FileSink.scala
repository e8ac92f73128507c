package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** File delivery — the reference's `Sinks\File` (payload → file(s); array
  * payload means one file per key; filename strategies DateTime/Timestamp,
  * `/root/reference/src/Sinks/File.php:46-120`). Spark-native: a
  * partitioned write IS file-per-key, and the format comes from the writer,
  * not the extension. Also covers `Sinks\Pdo` batch-insert mode
  * (`src/Sinks/Pdo.php:110-115`) when the target is a table-on-files:
  * `mode=Append` is the batch insert.
  */
object FileSink {

  def csv(df: DataFrame, path: String, header: Boolean = true,
          mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).option("header", header.toString).csv(path)

  def parquet(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).parquet(path)

  def json(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).json(path)

  /** XML file delivery — the reference's `Sinks\File` xml branch
    * (`/root/reference/src/Sinks/File.php:64-69` via XmlHelper::format);
    * Spark 4's built-in xml datasource, one row per `rowTag` element.
    */
  def xml(df: DataFrame, path: String, rowTag: String = "row",
          mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).option("rowTag", rowTag).format("xml").save(path)

  /** File-per-key (the reference's array⇒one file per key): hive-style
    * `partitionBy` — at scale this is also the partition-pruning layout.
    */
  def partitionedBy(df: DataFrame, path: String, format: String, keys: Seq[String],
                    mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).format(format).partitionBy(keys: _*).save(path)

  /** Backfill write: overwrite ONLY the hive partitions present in `df`,
    * leaving every other partition of the dataset untouched (dynamic
    * partition overwrite). The idempotent-reprocessing primitive: re-running
    * one day's extraction replaces that day, not the table.
    */
  def overwritePartitions(df: DataFrame, path: String, keys: Seq[String]): Unit = {
    require(keys.nonEmpty, "dynamic partition overwrite needs partition keys")
    // per-write option, NOT the session conf: a session-wide
    // partitionOverwriteMode=dynamic would silently change how every later
    // Overwrite+partitionBy write on this shared session truncates
    df.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(keys: _*).parquet(path)
  }

  /** Small-file compaction: rewrite a parquet dataset into
    * ceil(rows/targetRowsPerFile) evenly-sized files. The maintenance job
    * that keeps a corpus written by many incremental tasks readable —
    * thousands of KB-sized files turn a 100 TB scan into a metadata storm.
    * One count + one shuffle-free coalesce when shrinking (repartition when
    * the target needs MORE files than exist).
    */
  def compactTo(spark: org.apache.spark.sql.SparkSession, inPath: String,
                outPath: String, targetRowsPerFile: Long): Unit =
    compactFrame(spark.read.parquet(inPath), outPath, targetRowsPerFile)

  /** [[compactTo]] over an already-built frame (e.g. a filtered rewrite). */
  def compactFrame(df: org.apache.spark.sql.DataFrame, outPath: String,
                   targetRowsPerFile: Long): Unit = {
    require(targetRowsPerFile > 0)
    val nFiles = math.max(1L, math.ceil(
      df.count().toDouble / targetRowsPerFile).toLong).toInt
    val current = df.rdd.getNumPartitions
    val sized = if (nFiles < current) df.coalesce(nFiles) else df.repartition(nFiles)
    sized.write.mode(SaveMode.Overwrite).parquet(outPath)
  }

  /** Size-governed parquet write: `maxRecordsPerFile` caps rows per output
    * file (a task writing more rolls to a new file), `minPartitions` floors
    * write parallelism. The giant-file/small-file guard for corpus-scale
    * output: downstream readers get splittable, uniformly-sized files
    * regardless of upstream partitioning; with `partitionKeys` the layout
    * is additionally partition-pruned.
    */
  def parquetSized(df: DataFrame, path: String, maxRecordsPerFile: Long,
                   partitionKeys: Seq[String] = Nil,
                   mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(maxRecordsPerFile > 0)
    val w = df.write.mode(mode).option("maxRecordsPerFile", maxRecordsPerFile)
    (if (partitionKeys.nonEmpty) w.partitionBy(partitionKeys: _*) else w).parquet(path)
  }

  /** ORC write — the second columnar interchange format Spark executes
    * natively (no connector jar): predicate pushdown, column pruning, and
    * TIMESTAMP_NTZ all round-trip. For pipelines whose downstream warehouse
    * reads ORC rather than parquet.
    */
  def orc(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).orc(path)

  /** Training-consumption JSONL export: each row rendered as ONE compact
    * JSON object per line (`to_json` over the row struct — field order =
    * column order, deterministic), written as size-governed text files
    * (`maxRecordsPerFile` rolls a task to a new file). This is the format
    * LLM training stacks actually stream — splittable uniformly-sized
    * shards, optionally compressed (`compression = Some("gzip")`), with no
    * engine required to read them back.
    */
  def jsonlSized(df: DataFrame, path: String, maxRecordsPerFile: Long,
                 compression: Option[String] = None,
                 mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(maxRecordsPerFile > 0)
    import org.apache.spark.sql.functions.{col, struct, to_json}
    val lines = df.select(to_json(struct(df.columns.map(col): _*)).as("value"))
    val w = lines.write.mode(mode).option("maxRecordsPerFile", maxRecordsPerFile)
    compression.fold(w)(c => w.option("compression", c)).text(path)
  }
}
