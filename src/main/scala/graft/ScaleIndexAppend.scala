package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling measurement for the ANN index append tier ([[graft.ext.Ivf
  * .appendIndex]] / [[graft.ext.IvfPq.appendIndex]]): the claim is
  * structural — assignment is batch × nLists centroid flops and the write
  * is batch rows, so appending a fixed-size daily batch must cost the same
  * against a 1× and a 100× corpus — but the judge of that claim is a
  * clock, not a docstring. Builds the index at `multiplier`× the base
  * embeddings table (ids offset per replica), persists it, then times
  * [[appendIndex]] of a fixed 500-vector batch and one nProbe=1 search
  * from the re-read index.
  *
  * Usage: runMain graft.ScaleIndexAppend <sfDir> <multiplier> <label>
  * Prints one SCALE_APPEND line per index family.
  */
object ScaleIndexAppend {
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
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val corpus = (0 until mult).map(r =>
        base.select((col("vec_id") + r.toLong * 10000000L).as("vec_id"),
          col("embedding")))
      .reduce(_ unionByName _).localCheckpoint(true)
    val nCorpus = corpus.count()
    val batch = base.limit(500)
      .select((col("vec_id") + 900000000L).as("vec_id"), col("embedding"))
      .localCheckpoint(true)

    // IVF: build+persist (pay-once), then the daily append + one search
    val ivfDir = s"/tmp/graft_scale_ivf_$label"
    val t0 = System.nanoTime()
    val ivf = graft.ext.Ivf.build(corpus, "vec_id", "embedding", nLists = 64,
      maxIter = 3)
    graft.ext.Ivf.writeIndex(ivf, ivfDir)
    val ivfBuildSec = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    graft.ext.Ivf.appendIndex(spark, ivfDir, batch, "vec_id", "embedding")
    val ivfAppendSec = (System.nanoTime() - t1) / 1e9
    val t2 = System.nanoTime()
    val loaded = graft.ext.Ivf.readIndex(spark, ivfDir)
    val qv = base.filter(col("vec_id") === 1L).select("embedding")
      .head().getSeq[Float](0).map(_.toDouble).toSeq
    val nHits = graft.ext.Ivf.search(loaded.assigned, loaded, "vec_id",
      "embedding", qv, k = 10, nProbe = 1).count()
    val ivfSearchSec = (System.nanoTime() - t2) / 1e9
    println(f"SCALE_APPEND family=ivf label=$label corpus_rows=$nCorpus " +
      f"build_sec=$ivfBuildSec%.2f append_sec=$ivfAppendSec%.2f " +
      f"search_sec=$ivfSearchSec%.2f hits=$nHits")

    // IVF-PQ: the composed index, same protocol
    val pqDir = s"/tmp/graft_scale_ivfpq_$label"
    val t3 = System.nanoTime()
    val ivfpq = graft.ext.IvfPq.build(corpus, "vec_id", "embedding",
      dim = 64, m = 8, nLists = 64, maxIter = 3)
    graft.ext.IvfPq.writeIndex(ivfpq, pqDir)
    val pqBuildSec = (System.nanoTime() - t3) / 1e9
    val t4 = System.nanoTime()
    graft.ext.IvfPq.appendIndex(spark, pqDir, batch, "vec_id", "embedding")
    val pqAppendSec = (System.nanoTime() - t4) / 1e9
    val t5 = System.nanoTime()
    val nHits2 = graft.ext.IvfPq.search(graft.ext.IvfPq.readIndex(spark, pqDir),
      "vec_id", qv, k = 10, nProbe = 1).count()
    val pqSearchSec = (System.nanoTime() - t5) / 1e9
    println(f"SCALE_APPEND family=ivfpq label=$label corpus_rows=$nCorpus " +
      f"build_sec=$pqBuildSec%.2f append_sec=$pqAppendSec%.2f " +
      f"search_sec=$pqSearchSec%.2f hits=$nHits2")
    spark.stop()
  }
}
