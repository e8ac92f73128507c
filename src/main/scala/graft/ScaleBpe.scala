package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling measurement for the BPE tokenizer tier: train the merge table
  * on corpora of growing size, then count tokens for a FIXED batch against
  * each. Claims under test (see [[graft.ext.Bpe]]):
  *
  *  1. training's cluster work is ONE word-count aggregation — the merge
  *     loop itself runs on a table capped at `maxTrainWords`, so train
  *     time tracks the count shuffle (linear, cheap), not merges × corpus;
  *  2. applying the tokenizer to a fixed batch is FLAT in training-corpus
  *     size (the merge table is `maxMerges` rows no matter what it was
  *     trained on, and the batch's distinct-word relation doesn't change).
  *
  * Replicas get per-replica token suffixes (same construction as
  * [[GenScaleCorpus]]) so the distinct-word space ALSO grows with the
  * multiplier — the training cap must cut an ever-wider candidate set.
  *
  * Usage: runMain graft.ScaleBpe <sfDir> <multiplier> <label>
  * Prints one SCALE_BPE line.
  */
object ScaleBpe {
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
    val ref = (0 until mult).map { r =>
      docs.select((col("doc_id") + r.toLong * 1000000L).as("doc_id"),
        (if (r == 0) col("text")
         else regexp_replace(col("text"), "(\\S+)", "$1" + s"·r$r")).as("text"))
    }.reduce(_ unionByName _).localCheckpoint(true)
    val nRef = ref.count()
    val batch = docs.localCheckpoint(true)
    val nBatch = batch.count()

    val t0 = System.nanoTime()
    val merges = graft.ext.Bpe.trainMerges(ref, "text", maxMerges = 200,
      maxTrainWords = 65536)
    val trainSec = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    val counted = graft.ext.Bpe.tokenCounts(batch, "doc_id", "text", merges)
      .agg(count(lit(1)).as("n"), sum("n_bpe_tokens").as("s"))
      .collect().head
    val applySec = (System.nanoTime() - t1) / 1e9

    println(f"SCALE_BPE label=$label ref_docs=$nRef batch_docs=$nBatch " +
      f"merges=${merges.size} counted=${counted.getLong(0)} " +
      f"total_bpe=${counted.getLong(1)} " +
      f"train_sec=$trainSec%.2f apply_sec=$applySec%.2f")
    spark.stop()
  }
}
