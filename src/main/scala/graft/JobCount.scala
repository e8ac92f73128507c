package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageSubmitted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Measurement scratch (optimization rounds): per-query Spark job / stage /
  * task counts next to wall seconds, under the SAME session shape as Bench
  * (local[SPARK_GRAFT_CPUS], shuffle.partitions = cpus, noop sink). A query
  * whose wall clock is dominated by job count × scheduler overhead needs its
  * ALGORITHM to run fewer actions (fewer passes, fused stages); one
  * dominated by task time needs cheaper per-task work. Args = query names
  * (default: the slowest tier from the last bench_full.json).
  */
object JobCount {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskMs = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit = { stages.incrementAndGet(); () }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskInfo != null) taskMs.addAndGet(t.taskInfo.duration)
        ()
      }
    })
    // same warmup as Bench
    org.apache.spark.sql.functions.lit(1)
    spark.read.parquet(s"$sfDir/nation.parquet").groupBy("n_regionkey").count()
      .write.mode("overwrite").format("noop").save()
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "dedup_near_incremental", "dedup_near_classify", "dedup_near_e2e",
      "dedup_components", "dedup_semantic_incremental", "ann_ivfpq_append_recall",
      "dedup_minhash_pairs", "ann_ivfpq_recall", "dedup_ngram_jaccard",
      "search_bm25_index_append", "q2_join", "dedup_semantic",
      "curate_decontam_indexed", "ann_ivf", "text_lm_bigram")
    println(f"${"query"}%-28s ${"sec"}%8s ${"jobs"}%5s ${"stages"}%7s ${"tasks"}%6s ${"taskSec"}%8s")
    names.foreach { n =>
      SparkEntry.benchPrimers.get(n).foreach(p => p(spark, sfDir))
      System.gc()
      // settle async listener events from priming before zeroing
      Thread.sleep(300)
      jobs.set(0); stages.set(0); tasks.set(0); taskMs.set(0L)
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).write.mode("overwrite").format("noop").save()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let listener drain
      println(f"$n%-28s $sec%8.3f ${jobs.get}%5d ${stages.get}%7d ${tasks.get}%6d ${taskMs.get / 1000.0}%8.1f")
    }
    spark.stop()
  }
}
