package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling measurement for Bloom membership dedup: a fixed batch
  * classified against corpora of growing size. The design claims under
  * test: (1) build is one linear scan whose only cross-node traffic is
  * the fixed-size bitmap (partitions × m/8 bytes, independent of row
  * count); (2) classify is map-only over the batch — cost flat in corpus
  * size, because the corpus is represented by the same m/8-byte broadcast
  * no matter how many rows fed it. Corpus replicas get per-replica token
  * suffixes (disjoint content), so corpus growth is real while the
  * batch's true-duplicate set stays fixed — flagged counts must only
  * grow by false positives, whose rate the printed line exposes.
  *
  * Usage: runMain graft.ScaleBloom <sfDir> <multiplier> <label>
  * Prints one SCALE_BLOOM line.
  */
object ScaleBloom {
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

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val corpusBase = docs.filter(col("doc_id") % 5 =!= 0)
    val corpus = (0 until mult).map { r =>
      corpusBase.select((col("doc_id") + r.toLong * 1000000L).as("doc_id"),
        (if (r == 0) col("text")
         else regexp_replace(col("text"), "(\\S+)", "$1" + s"·r$r")).as("text"))
    }.reduce(_ unionByName _).repartition(cpus.toInt).localCheckpoint(true)
    val nCorpus = corpus.count()

    // fixed batch: held-out docs + planted replica-0 copies (true dups)
    val batch = docs.filter(col("doc_id") % 5 === 0)
      .unionByName(corpusBase.filter(col("doc_id") % 7 === 0)
        .withColumn("doc_id", col("doc_id") + 9000000L))
      .localCheckpoint(true)
    val nBatch = batch.count()
    val nTrueDup = corpusBase.filter(col("doc_id") % 7 === 0).count()

    // m sized for the LARGEST corpus this harness runs (100×): ~10 bits
    // per doc at sf0.01 × 100 ≈ 400k docs → 2^22 bits = 512 KB bitmap
    val m = 1L << 22
    val k = 7

    val t0 = System.nanoTime()
    val bits = graft.ext.Bloom.build(corpus, "text", k, m)
    val buildSec = (System.nanoTime() - t0) / 1e9
    val setBits = bits.map(java.lang.Long.bitCount).map(_.toLong).sum

    val t1 = System.nanoTime()
    val flagged = graft.ext.Bloom.flagDuplicates(batch, "text", bits, k, m)
      .filter(col("maybe_dup")).count()
    val classifySec = (System.nanoTime() - t1) / 1e9

    println(f"SCALE_BLOOM label=$label corpus=$nCorpus batch=$nBatch " +
      f"build_sec=$buildSec%.2f classify_sec=$classifySec%.2f " +
      f"flagged=$flagged true_dups=$nTrueDup set_bits=$setBits " +
      f"fill_pct=${setBits * 100.0 / m}%.2f")
    spark.stop()
  }
}
