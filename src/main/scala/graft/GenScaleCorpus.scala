package graft

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Generates an N× scaled copy of a testdata dir's `documents` /
  * `embeddings` tables (plus `nation`, which [[Bench]]'s warmup reads) —
  * the input for the SCALING.md scaling-curve runs.
  *
  * Replica construction preserves the SOURCE corpus's duplicate structure
  * instead of multiplying it: every token of replica r > 0 gets an `·rN`
  * suffix, so replicas share no shingles and near-dup pair counts grow
  * linearly with the multiplier. A naive union of identical copies would
  * put every document in a mult-deep duplicate cluster and the pair space
  * would grow quadratically — a different (and unfair) experiment from
  * "the same workload at N× the rows". Embeddings are scaled/shifted per
  * replica for the same reason. Replica id offset is 100k per replica, so
  * a 10× corpus stays below the +1000000 planted-copy id space the
  * registered queries use.
  *
  * Usage: runMain graft.GenScaleCorpus <srcSfDir> <outDir> <multiplier>
  */
object GenScaleCorpus {
  def main(args: Array[String]): Unit = {
    val Array(srcDir, outDir, multS) = args
    val mult = multS.toInt
    require(mult >= 1 && mult <= 10, "multiplier must keep ids below the " +
      "registered queries' +1000000 planted-copy offset (max replica id = " +
      "(mult-1)*100000 + maxSrcId < 1000000)")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val step = 100000L

    val docs = spark.read.parquet(s"$srcDir/documents.parquet")
    (0 until mult).map { r =>
      docs.select(
        (col("doc_id") + lit(r * step)).as("doc_id"),
        (if (r == 0) col("text")
         else regexp_replace(col("text"), "(\\S+)", "$1" + s"·r$r"))
          .as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionByName _)
      .repartition(32)
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/documents.parquet")

    val emb = spark.read.parquet(s"$srcDir/embeddings.parquet")
    (0 until mult).map { r =>
      emb.select(
        (col("vec_id") + lit(r * step)).as("vec_id"),
        (if (r == 0) col("embedding")
         else transform(col("embedding"),
           x => (x * lit(1.0f + r * 0.01f) + lit(r * 0.003f)).cast("float")))
          .as("embedding"),
        col("label"))
    }.reduce(_ unionByName _)
      .repartition(32)
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/embeddings.parquet")

    spark.read.parquet(s"$srcDir/nation.parquet")
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/nation.parquet")
    println(s"wrote ${mult}x corpus to $outDir")
    spark.stop()
  }
}
