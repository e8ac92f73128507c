package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling measurement for the unigram-LM quality tier: train the model on
  * reference corpora of growing size, then score a FIXED batch against
  * each. The design claims under test:
  *
  *  1. the trained artifact is BOUNDED — `maxVocab + 1` rows no matter how
  *     large the reference corpus (the cap binds, the model broadcast
  *     never grows);
  *  2. scoring a fixed batch is therefore FLAT in reference-corpus size
  *     (the batch-side scan and the broadcast hash join don't change);
  *  3. training cost grows with the reference corpus, but as one
  *     map-side-combined token count + a TakeOrdered head — the cheapest
  *     shuffle shape there is (token-cardinality rows on the wire, never
  *     text).
  *
  * Reference replicas get per-replica token suffixes (same construction
  * as [[GenScaleCorpus]]), so vocabulary CARDINALITY grows with the
  * multiplier too — the hard case for claim 1: the cap (256 here; the
  * synthetic fixture has a tiny base vocabulary) must cut an
  * ever-wider candidate set and the count shuffle carries mult× distinct
  * tokens.
  *
  * Usage: runMain graft.ScaleLm <sfDir> <multiplier> <label>
  * Prints one SCALE_LM line.
  */
object ScaleLm {
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
      .select("doc_id", "text", "lang")
    val en = docs.filter(col("lang") === "en").select("doc_id", "text")
    val ref = (0 until mult).map { r =>
      en.select((col("doc_id") + r.toLong * 1000000L).as("doc_id"),
        (if (r == 0) col("text")
         else regexp_replace(col("text"), "(\\S+)", "$1" + s"·r$r")).as("text"))
    }.reduce(_ unionByName _).localCheckpoint(true)
    val nRef = ref.count()

    val batch = docs.select("doc_id", "text").localCheckpoint(true)
    val nBatch = batch.count()

    val dir = s"/tmp/graft_scale_lm_$label"
    org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(dir), true)

    val t0 = System.nanoTime()
    graft.ext.Lm.writeModel(spark,
      graft.ext.Lm.unigramModel(ref, "text", maxVocab = 256), dir)
    val trainSec = (System.nanoTime() - t0) / 1e9
    val modelRows = graft.ext.Lm.readModel(spark, dir).count()

    val t1 = System.nanoTime()
    val scored = graft.ext.Lm.scoreUnigram(batch, "doc_id", "text",
      graft.ext.Lm.readModel(spark, dir))
      .agg(count(lit(1)).as("n"), sum("avg_lp_milli").as("s"))
      .collect().head
    val scoreSec = (System.nanoTime() - t1) / 1e9

    println(f"SCALE_LM label=$label ref_docs=$nRef batch_docs=$nBatch " +
      f"model_rows=$modelRows scored=${scored.getLong(0)} " +
      f"train_sec=$trainSec%.2f score_sec=$scoreSec%.2f")

    // the bigram tier under the same protocol: both tables are capped
    // (maxVocab unigrams, maxBigrams conditionals), so scoring the fixed
    // batch must stay flat while training pays one extra pair-count
    // aggregation over the reference
    val bdir = s"/tmp/graft_scale_lm_bi_$label"
    org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(bdir), true)
    val t2 = System.nanoTime()
    graft.ext.Lm.writeBigramModel(spark,
      graft.ext.Lm.bigramModel(ref, "text", maxVocab = 256, maxBigrams = 1024),
      bdir)
    val biTrainSec = (System.nanoTime() - t2) / 1e9
    val biModel = graft.ext.Lm.readBigramModel(spark, bdir)
    val biRows = biModel.bigram.count()
    val t3 = System.nanoTime()
    val biScored = graft.ext.Lm.scoreBigram(batch, "doc_id", "text", biModel)
      .agg(count(lit(1)).as("n"), sum("avg_lp_milli").as("s"))
      .collect().head
    val biScoreSec = (System.nanoTime() - t3) / 1e9
    println(f"SCALE_LM_BIGRAM label=$label ref_docs=$nRef bigram_rows=$biRows " +
      f"scored=${biScored.getLong(0)} train_sec=$biTrainSec%.2f " +
      f"score_sec=$biScoreSec%.2f")
    spark.stop()
  }
}
