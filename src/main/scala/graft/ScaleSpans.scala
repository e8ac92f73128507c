package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling measurement for [[graft.ext.Spans.duplicateSpans]] /
  * [[graft.ext.Spans.removeDuplicateSpans]]: replicate the documents table
  * `mult`× with per-replica token suffixes (replicas share NO shingles, so
  * the duplicate structure — a planted boilerplate suffix on every third
  * doc plus a verbatim copy of every seventh, per replica — is identical
  * at every scale and the span count must grow exactly linearly, which
  * doubles as a correctness check). Measures the find-spans and
  * strip-spans wall times; the pipeline's shuffles carry (id, pos, hash)
  * postings and (hash, count) pairs, both linear in corpus tokens, so the
  * expected curve is ~linear time with no quadratic kink.
  *
  * Usage: runMain graft.ScaleSpans <sfDir> <multiplier> <label>
  * Prints one SCALE_SPANS line.
  */
object ScaleSpans {
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

    val base0 = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val planted = base0.withColumn("text",
      when(col("doc_id") % 3 === 0,
        concat(col("text"), lit(" LICENSE HEADER COMMON TO MANY DOCUMENTS IN CORPUS")))
        .otherwise(col("text")))
      .unionByName(base0.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 500000L).as("doc_id"), col("text")))
    val corpus = (0 until mult).map { r =>
      planted.select((col("doc_id") + r.toLong * 1000000L).as("doc_id"),
        (if (r == 0) col("text")
         else regexp_replace(col("text"), "(\\S+)", "$1" + s"·r$r")).as("text"))
    }.reduce(_ unionByName _).localCheckpoint(true)
    val nDocs = corpus.count()

    val t0 = System.nanoTime()
    val nSpans = graft.ext.Spans.duplicateSpans(corpus, "doc_id", "text").count()
    val findSec = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val nRemoved = graft.ext.Spans.removeDuplicateSpans(corpus, "doc_id", "text")
      .agg(sum("n_removed")).head.getLong(0)
    val stripSec = (System.nanoTime() - t1) / 1e9
    println(f"SCALE_SPANS label=$label docs=$nDocs spans=$nSpans " +
      f"removed_tokens=$nRemoved find_sec=$findSec%.2f strip_sec=$stripSec%.2f")
    spark.stop()
  }
}
