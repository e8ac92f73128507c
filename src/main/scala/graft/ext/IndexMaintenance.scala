package graft.ext

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Compaction for stamped index layouts under daily appends.
  *
  * Every append-capable index here ([[Dedup.appendNearIndex]],
  * [[Ivf.appendIndex]], [[Pq.appendIndex]], [[IvfPq.appendIndex]]) adds a
  * few parquet files per batch; after a year of ingest a scan is
  * listing/footer-bound before it is data-bound (measured for the
  * near-dedup index in SCALING.md r12 — ~2 files/day, ~730/yr per dir).
  * This is the one maintenance pass they all share: rewrite each data
  * subdir into few, evenly-sized files — partition-preserving where the
  * layout is partitioned, so `list_id=*` pruning keeps working — with the
  * expensive rewrite OUTSIDE the commit-marker window and only the rename
  * swap inside it.
  *
  * Crash safety contract (same as [[Dedup.compactNearIndex]], which
  * delegates here): rewrites land in hidden `.compact_*` siblings while
  * the index stays stamped and readable; then invalidate → swap → stamp.
  * A crash mid-swap leaves an unstamped root with remnants that
  * data-presence dispatch still reports as an index, so ingest fails
  * loudly instead of bootstrapping over it; readers reject via
  * [[IndexFormat.check]] until repaired.
  */
object IndexMaintenance {

  /** Rewrite the `subs` data dirs of the stamped index at `root`.
    * Each entry is (subdir, partitionCols): partitioned dirs are
    * re-partitioned on their partition columns (one task — and so one
    * file — per partition value, rolled by `targetRowsPerFile`);
    * unpartitioned dirs shrink to ceil(rows/targetRowsPerFile) files.
    */
  def compactStamped(spark: SparkSession, root: String, formatId: String,
                     subs: Seq[(String, Seq[String])],
                     targetRowsPerFile: Long = 4000000L): Unit = {
    require(targetRowsPerFile > 0)
    IndexFormat.check(spark, root, formatId)
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(s"$root/$s")
    subs.foreach { case (sub, parts) =>
      fs.delete(p(s".compact_$sub"), true)
      if (parts.isEmpty)
        graft.sources.FileSink.compactTo(spark, s"$root/$sub",
          s"$root/.compact_$sub", targetRowsPerFile)
      else {
        val df = spark.read.parquet(s"$root/$sub")
        df.repartition(parts.map(col): _*)
          .write.mode(SaveMode.Overwrite)
          .option("maxRecordsPerFile", targetRowsPerFile)
          .partitionBy(parts: _*)
          .parquet(s"$root/.compact_$sub")
      }
    }
    IndexFormat.invalidate(spark, root)
    subs.foreach { case (sub, _) =>
      fs.delete(p(s".old_$sub"), true)
      require(fs.rename(p(sub), p(s".old_$sub")), s"rename $sub -> .old_$sub failed")
      require(fs.rename(p(s".compact_$sub"), p(sub)), s"rename .compact_$sub -> $sub failed")
      fs.delete(p(s".old_$sub"), true)
    }
    IndexFormat.stamp(spark, root, formatId)
  }
}
