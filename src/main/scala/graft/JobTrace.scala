package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Measurement scratch (optimization rounds): per-JOB trace of one query —
  * job call site, duration, task count — so a job-count-bound query's jobs
  * can be attributed to the operator sections that schedule them.
  */
object JobTrace {
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
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val epoch = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val site = j.stageInfos.lastOption.map(s => s.name.take(90)).getOrElse("?")
        starts.put(j.jobId, (site, j.time)); ()
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val (site, t0) = starts.getOrDefault(e.jobId, ("?", e.time))
        val rel0 = (t0 - epoch.get) / 1000.0
        val rel1 = (e.time - epoch.get) / 1000.0
        lines.add(f"job ${e.jobId}%4d  [$rel0%7.3f -> $rel1%7.3f]  $site")
        ()
      }
    })
    spark.read.parquet(s"$sfDir/nation.parquet").groupBy("n_regionkey").count()
      .write.mode("overwrite").format("noop").save()
    val name = if (args.nonEmpty) args(0) else "dedup_near_classify"
    SparkEntry.benchPrimers.get(name).foreach(p => p(spark, sfDir))
    Thread.sleep(500)
    lines.clear()
    epoch.set(System.currentTimeMillis())
    val t0 = System.nanoTime()
    SparkEntry.queries(name)(spark, sfDir).write.mode("overwrite").format("noop").save()
    val sec = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    println(s"== $name: ${lines.size} jobs, $sec s")
    lines.forEach(l => println(l))
    spark.stop()
  }
}
