package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling measurement for the persisted BM25 index
  * ([[graft.ext.SearchIndex]]) against the scan form
  * ([[graft.ext.Search.bm25TopK]]). The structural claim: the scan form
  * re-tokenizes EVERY document's text per query (corpus-bytes work), while
  * the indexed form reads only the query terms' postings — a bkt-pruned,
  * `w IN`-filtered parquet scan of (id, tf, dl) rows, so per-query bytes
  * track the terms' document frequency, never the corpus text. Both grow
  * with corpus size for corpus-frequent terms (df is a fraction of N), but
  * the indexed constant is postings-row-sized, not document-text-sized —
  * and the pay-once build is what amortizes it. Appending a fixed daily
  * batch must cost the batch, not the corpus.
  *
  * Usage: runMain graft.ScaleSearchIndex <sfDir> <multiplier> <label>
  * Prints one SCALE_SEARCH line.
  */
object ScaleSearchIndex {
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

    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val corpus = (0 until mult).map(r =>
        base.select((col("doc_id") + r.toLong * 10000000L).as("doc_id"),
          col("text")))
      .reduce(_ unionByName _).localCheckpoint(true)
    val nCorpus = corpus.count()
    val terms = Seq("hash", "join", "vector")

    // the per-query cost WITHOUT an index: full corpus tokenize per query
    val t0 = System.nanoTime()
    val scanHits = graft.ext.Search.bm25TopK(corpus, "doc_id", "text",
      terms, k = 20).count()
    val scanSec = (System.nanoTime() - t0) / 1e9

    // pay-once build, then the per-query cost FROM the index
    val dir = s"/tmp/graft_scale_sidx_$label"
    org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(dir), true)
    val t1 = System.nanoTime()
    graft.ext.SearchIndex.build(corpus, "doc_id", "text", dir, nBuckets = 64)
    val buildSec = (System.nanoTime() - t1) / 1e9
    val t2 = System.nanoTime()
    val idxHits = graft.ext.SearchIndex.bm25TopKIndexed(spark, dir, terms,
      k = 20, idColName = "doc_id").count()
    val querySec = (System.nanoTime() - t2) / 1e9

    // fixed 500-doc daily append: must cost the batch, not the corpus
    val batch = base.limit(500)
      .select((col("doc_id") + 900000000L).as("doc_id"), col("text"))
      .localCheckpoint(true)
    val t3 = System.nanoTime()
    graft.ext.SearchIndex.append(batch, "doc_id", "text", dir)
    val appendSec = (System.nanoTime() - t3) / 1e9

    println(f"SCALE_SEARCH label=$label corpus_rows=$nCorpus " +
      f"scan_query_sec=$scanSec%.2f build_sec=$buildSec%.2f " +
      f"indexed_query_sec=$querySec%.2f append_sec=$appendSec%.2f " +
      f"hits_scan=$scanHits hits_idx=$idxHits")
    spark.stop()
  }
}
