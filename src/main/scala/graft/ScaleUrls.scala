package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling measurement for the URL-curation tier ([[graft.ext.Urls]]):
  * normalization is claimed scan-bound (pure regex projection, no
  * shuffle — PlanShapeSpec pins the plan) and URL-level dedup's one
  * shuffle carries (canonical-url, id) keys. Replicates the synthetic
  * URL corpus `multiplier`× — every page id appears as TWO decorated
  * variants (case/port/slash/params/fragment) that must collapse, plus a
  * malformed row per 10 pages (exercising the per-row synthetic window
  * keys) — and times normalize-only and full dedup passes.
  *
  * Usage: runMain graft.ScaleUrls <sfDir> <multiplier> <label>
  * Prints one SCALE_URLS line.
  */
object ScaleUrls {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, multS, label) = args
    val mult = multS.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id")
    val ids = (0 until mult).map(r =>
        base.select((col("doc_id") + r.toLong * 10000000L).as("doc_id")))
      .reduce(_ unionByName _)
    val k = floor(col("doc_id") / 2).cast("long")
    val urls = ids.select(col("doc_id"),
        when(col("doc_id") % 20 === 19, lit("not a url"))
          .otherwise(concat(
            when(col("doc_id") % 2 === 0, lit("HTTPS")).otherwise(lit("https")),
            lit("://Site"), (k % 997).cast("string"),
            when(col("doc_id") % 2 === 0, lit(".Example.COM:443"))
              .otherwise(lit(".example.com")),
            lit("/docs/"), k.cast("string"),
            when(col("doc_id") % 2 === 0, lit("/?utm_source=feed&b=2&a=1#frag"))
              .otherwise(lit("?a=1&b=2")))).as("url"))
      .localCheckpoint(true)
    val nRows = urls.count()

    val t0 = System.nanoTime()
    val nNorm = urls.select(graft.ext.Urls.normalizeUrl(col("url")).as("u"))
      .filter(col("u").isNotNull).count()
    val normSec = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    val nKept = graft.ext.Urls.dedupByUrl(urls, "doc_id", "url").count()
    val dedupSec = (System.nanoTime() - t1) / 1e9

    println(f"SCALE_URLS label=$label rows=$nRows normalized=$nNorm " +
      f"kept=$nKept norm_sec=$normSec%.2f dedup_sec=$dedupSec%.2f")
    spark.stop()
  }
}
