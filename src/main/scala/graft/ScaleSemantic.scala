package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling measurement for [[graft.ext.Dedup.semanticDedupIncremental]] —
  * and an HONEST one: unlike the near-dedup signature index (whose
  * classify is postings point-lookups, measured near-flat), the SemDeDup
  * cross stage compares each batch row against its whole stored cell, so
  * classify cost is O(batch × corpus / k) — LINEAR in the corpus at fixed
  * k. The declared scale lever is k itself (the SemDeDup paper runs ~50k
  * clusters at web scale precisely so cells stay small). This harness
  * measures both sides of that claim: a fixed 500-vector batch classified
  * at (a) k frozen at its 1× value and (b) k grown with the corpus, so
  * the SCALING.md table can show the fixed-k cost growing and the
  * scaled-k cost staying near-flat — the number that tells an operator
  * how to size k at 100 TB.
  *
  * Usage: runMain graft.ScaleSemantic <sfDir> <multiplier> <label>
  * Prints one SCALE_SEM line.
  */
object ScaleSemantic {
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

    val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    // replicas keep the base vectors (classify cost depends on row counts,
    // not values); ids stay below the batch's +50M/+60M ranges
    val corpus = (0 until mult).map(r =>
        base.select((col("vec_id") + r.toLong * 1000000L).as("vec_id"),
          col("embedding")))
      .reduce(_ unionByName _).localCheckpoint(true)
    val nCorpus = corpus.count()

    // fixed batch: 250 verbatim copies (dup_corpus path) + 250 negations
    // (admitted path — negation is far from everything at 0.999 cosine)
    val batch = base.limit(250)
      .select((col("vec_id") + 50000000L).as("vec_id"), col("embedding"))
      .unionByName(base.orderBy(col("vec_id").desc).limit(250)
        .select((col("vec_id") + 60000000L).as("vec_id"),
          transform(col("embedding"), x => negate(x)).as("embedding")))
      .localCheckpoint(true)

    def run(k: Int, tag: String): (Double, Double, Map[String, Long]) = {
      val idx = s"/tmp/graft_scale_sem_${label}_$tag"
      org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(idx), true)
      val t0 = System.nanoTime()
      graft.ext.Dedup.buildSemanticIndex(corpus, "vec_id", "embedding", idx,
        k = k, dim = 64)
      val buildSec = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val verdicts = graft.ext.Dedup.semanticDedupIncremental(batch,
          "vec_id", "embedding", idx, k = k, dim = 64, threshold = 0.999)
        .groupBy("verdict").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val classifySec = (System.nanoTime() - t1) / 1e9
      (buildSec, classifySec, verdicts)
    }

    val kFixed = 64
    val kScaled = 64 * mult
    val (bF, cF, vF) = run(kFixed, "fixedk")
    val (bS, cS, vS) = run(kScaled, "scaledk")
    println(f"SCALE_SEM label=$label corpus_rows=$nCorpus " +
      f"k_fixed=$kFixed build_fixed_sec=$bF%.2f classify_fixed_sec=$cF%.2f " +
      f"k_scaled=$kScaled build_scaled_sec=$bS%.2f classify_scaled_sec=$cS%.2f " +
      s"verdicts_fixed=$vF verdicts_scaled=$vS")
    spark.stop()
  }
}
