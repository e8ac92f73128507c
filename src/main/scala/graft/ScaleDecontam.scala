package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling measurement for the persisted decontamination index: a fixed
  * training batch classified against benchmark indexes of growing size.
  * The design claim is that the stored DISTINCT shingle hashes broadcast
  * (eval sets are the small side by nature) so the training batch — the
  * 100 TB side — never shuffles; the measurable consequence is classify
  * time flat in the batch and only weakly dependent on index size until
  * the broadcast itself becomes the cost.
  *
  * Benchmarks are synthesized from the documents table with per-replica
  * token suffixes (replicas share no shingles, so index size grows
  * without changing which batch rows are contaminated — verdict counts
  * must be identical at every scale).
  *
  * Shingles are 5-grams: at 3-grams the synthetic corpus is so
  * self-similar that every batch doc shares some shingle with some
  * benchmark and the survivor count degenerates to zero.
  *
  * Usage: runMain graft.ScaleDecontam <sfDir> <multiplier> <label>
  * Prints one SCALE_DECONTAM line.
  */
object ScaleDecontam {
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
    // eval side: every tenth doc, replicated mult× with disjoint shingles
    val evalBase = docs.filter(col("doc_id") % 10 === 0)
    val eval = (0 until mult).map { r =>
      evalBase.select((col("doc_id") + r.toLong * 1000000L).as("doc_id"),
        (if (r == 0) col("text")
         else regexp_replace(col("text"), "(\\S+)", "$1" + s"·r$r")).as("text"))
    }.reduce(_ unionByName _).localCheckpoint(true)
    val nEval = eval.count()

    // fixed batch: the non-eval docs plus planted copies of replica-0 eval
    // content — the contaminated set is identical at every mult
    val batch = docs.filter(col("doc_id") % 10 =!= 0)
      .unionByName(evalBase.select((col("doc_id") + 900000000L).as("doc_id"),
        col("text")))
      .localCheckpoint(true)
    val nBatch = batch.count()

    val idx = s"/tmp/graft_scale_dc_$label"
    org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(idx), true)
    val t0 = System.nanoTime()
    graft.ext.Curation.buildDecontamIndex(eval, "doc_id", "text", idx, shingleN = 5)
    val buildSec = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val surviving = graft.ext.Curation.decontaminateIncremental(
      batch, "doc_id", "text", idx, shingleN = 5).count()
    val classifySec = (System.nanoTime() - t1) / 1e9
    println(f"SCALE_DECONTAM label=$label eval_docs=$nEval batch_docs=$nBatch " +
      f"surviving=$surviving build_sec=$buildSec%.2f classify_sec=$classifySec%.2f")
    spark.stop()
  }
}
