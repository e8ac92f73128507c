package graft.ext

import org.apache.spark.sql.{SaveMode, SparkSession}

/** Format stamps for persisted ANN indexes.
  *
  * Why this exists: the meaning of a persisted `code` column is invisible in
  * the bytes. [[IvfPq]] codes quantize the residual `y − centroid(cell)`
  * while [[Pq]] codes quantize the raw vector — the two directory layouts
  * are otherwise byte-compatible, so a raw-code index scored against
  * residual ADC tables (or vice versa) returns systematically wrong
  * rankings with no error. Every `writeIndex` therefore stamps a one-row
  * `_meta` parquet naming its encoding, and every `readIndex` fails fast on
  * a missing or mismatched stamp instead of silently mis-ranking.
  *
  * `_meta` is a sibling of the data dirs (`codes/`, `centroids/`, …);
  * the leading underscore keeps it out of any recursive data listing, and
  * going through Spark (not java.nio) keeps the stamp filesystem-agnostic —
  * the same index layout works on HDFS/S3 on a real cluster.
  */
object IndexFormat {

  /** Stamp `path/_meta` with this index's format id (overwrite-safe).
    *
    * Ordering contract: the stamp is a COMMIT MARKER, not a label —
    * writers must [[invalidate]] first, write every data dir, and stamp
    * LAST. A stamp written before the data would validate a partially
    * (re)written index: a failure after the stamp but before the data
    * dirs finish leaves a current-format `_meta` over stale or
    * mixed-generation data, and [[check]] would wave the exact mis-ranking
    * through that it exists to stop.
    */
  def stamp(spark: SparkSession, path: String, format: String): Unit = {
    import spark.implicits._
    Seq(format).toDF("format")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$path/_meta")
  }

  /** Remove `path/_meta` (no-op if absent) — the first step of every index
    * (re)write, so an in-place rewrite that dies mid-data leaves an
    * UNSTAMPED index that [[check]] rejects, never a validly-stamped mix
    * of old and new generations.
    */
  def invalidate(spark: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$path/_meta")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
    ()
  }

  /** The stamped format id, if any — for maintenance passes that accept a
    * format FAMILY (a stamp prefix, e.g. any `imagededup:v1:` parameterization)
    * and must restamp the exact original id after the rewrite.
    */
  def readFormat(spark: SparkSession, path: String): Option[String] =
    try spark.read.parquet(s"$path/_meta").select("format")
      .collect().headOption.map(_.getString(0))
    catch {
      case _: org.apache.spark.sql.AnalysisException => None
    }

  /** Require `path/_meta` to carry exactly `expected`; a missing stamp is
    * treated as an incompatible (pre-versioning) index, not a pass — that
    * is the case the stamp exists to catch.
    */
  def check(spark: SparkSession, path: String, expected: String): Unit = {
    val found =
      try spark.read.parquet(s"$path/_meta").select("format")
        .collect().headOption.map(_.getString(0))
      catch {
        case _: org.apache.spark.sql.AnalysisException => None
      }
    found match {
      case Some(f) if f == expected => ()
      case Some(f) => throw new IllegalStateException(
        s"index at $path has format '$f' but this reader expects " +
          s"'$expected' — the encodings are incompatible (raw-vector vs " +
          "residual codes score differently); rebuild the index with the " +
          "matching writer")
      case None => throw new IllegalStateException(
        s"index at $path has no _meta format stamp — it predates index " +
          s"versioning and its code encoding cannot be trusted to be " +
          s"'$expected'; rebuild it with the current writer")
    }
  }
}
