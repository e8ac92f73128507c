package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark main: runs every registered query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * Materialization: results are written to the `noop` sink — every row is
  * fully computed and serialized by the executors but discarded, so
  * expression-heavy projections are really timed (a bare `.count()` lets
  * Catalyst prune unused projections and times a near-no-op).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JIT/codegen warmup so the first timed query doesn't absorb session
    // startup (a scan + a tiny shuffle + a write through the noop sink)
    spark.read.parquet(s"$sfDir/nation.parquet").groupBy("n_regionkey").count()
      .write.mode("overwrite").format("noop").save()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // pay accumulated GC debt outside the next query's timing window —
      // without this one random query per run absorbs a multi-second pause
      System.gc()
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.mode("overwrite").format("noop").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
        }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    // 3-decimal (ms) precision keeps the line short, and the headline
    // fields go LAST: the driver records only the tail of the output, so a
    // long per-query map must not push value/mean past the capture window
    def r3(v: Double): String = if (v < 0) "-1" else f"$v%.3f"
    val qs = results.map { case (k, v) => "\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val ok = results.collect { case (_, v) if v >= 0 => v }
    val total = ok.sum
    // n_queries/mean: the registered surface has grown ~2× since the first
    // recorded baseline (52 queries / 54 s) — per-query mean is the
    // load-comparable number across rounds
    println(s"""{"queries":$qs,"sf":"$sfDir","metric":"total","unit":"sec","n_queries":${ok.size},"mean_per_query":${r3(total / math.max(ok.size, 1))},"value":${r3(total)}}""")
    spark.stop()
  }
}
