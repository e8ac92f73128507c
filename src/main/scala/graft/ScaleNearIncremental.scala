package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling measurement for [[graft.ext.Dedup.nearDedupIncremental]] — the
  * claim under test is the operator's reason to exist: with the corpus
  * held as a persisted signature index, the cost of classifying a
  * FIXED-SIZE daily batch should stay near-flat as the corpus grows
  * (index build is the linear, pay-once part; daily classify reads stored
  * postings + candidate shingle rows only, never corpus text).
  *
  * Protocol: corpus = a GenScaleCorpus output (or the base sf dir);
  * batch = 250 verbatim copies of base documents (dup_corpus — exercises
  * the cross rescore's point lookups) + 250 token-suffixed novels
  * (admitted — exercises the no-match path), ids in a free range. Prints
  * one line: multiplier label, corpus rows, index-build sec, classify sec.
  *
  * Usage: runMain graft.ScaleNearIncremental <corpusDir> <baseSfDir> <label>
  */
object ScaleNearIncremental {
  def main(args: Array[String]): Unit = {
    val Array(corpusDir, baseSfDir, label) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val corpus = spark.read.parquet(s"$corpusDir/documents.parquet")
      .select("doc_id", "text")
    val nCorpus = corpus.count()

    val base = spark.read.parquet(s"$baseSfDir/documents.parquet")
      .select("doc_id", "text").orderBy("doc_id").limit(500)
    // ids far above any replica range (GenScaleCorpus caps below +1000000)
    val batch = base.limit(250)
      .select((col("doc_id") + 50000000L).as("doc_id"), col("text"))
      .unionByName(base.orderBy(col("doc_id").desc).limit(250)
        .select((col("doc_id") + 60000000L).as("doc_id"),
          // per-token suffix — novel shingles, same length profile
          array_join(transform(split(col("text"), "\\s+"), t => concat(t, lit("·q"))), " ")
            .as("text")))
      .localCheckpoint(true)  // batch prep excluded from the classify clock

    val idx = s"/tmp/graft_scale_nearidx_$label"
    val t0 = System.nanoTime()
    graft.ext.Dedup.buildNearIndex(corpus, "doc_id", "text", idx)
    val buildSec = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    val verdicts = graft.ext.Dedup
      .nearDedupIncremental(batch, "doc_id", "text", idx, minJaccard = 0.5)
      .groupBy("verdict").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val classifySec = (System.nanoTime() - t1) / 1e9

    println(f"SCALE_NEAR_INC label=$label corpus_rows=$nCorpus " +
      f"build_sec=$buildSec%.2f classify_sec=$classifySec%.2f verdicts=$verdicts")
    spark.stop()
  }
}
