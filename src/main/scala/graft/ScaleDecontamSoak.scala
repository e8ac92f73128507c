package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** 100-day append/classify soak for the persisted DECONTAMINATION index —
  * the [[ScaleNearSoak]] protocol applied to
  * [[graft.ext.Curation.buildDecontamIndex]]: benchmarks arrive daily
  * ([[graft.ext.Curation.appendDecontamIndex]] with per-day token
  * suffixes, so each day's eval set shares no shingles with any other),
  * and the SAME fixed training batch is classified every day. The design
  * claim under test: classify broadcasts the stored distinct shingles
  * over the batch — the batch never shuffles — so per-day classify stays
  * FLAT while the index grows ~days×, with only the broadcast itself
  * growing (linearly, small constant). End of soak: fragmented-vs-
  * compacted classify over identical contents + compaction cost, same as
  * the near/semantic soaks.
  *
  * Survivor invariant: only replica-0 (the build-day benchmarks) shares
  * shingles with the planted batch contamination, so the surviving-row
  * count must be IDENTICAL on every day — any drift is a correctness
  * bug, not noise (asserted, not just printed).
  *
  * Usage: runMain graft.ScaleDecontamSoak <sfDir> <days> <label>
  * Prints one SOAK_DC line per sampled day + a SOAK_DC_SUMMARY line.
  */
object ScaleDecontamSoak {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, daysS, label) = args
    val days = daysS.toInt
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
    // eval side: every tenth doc; day-d arrivals carry a ·dD suffix on
    // every token (disjoint shingles from every other day, 5-grams as in
    // ScaleDecontam — 3-grams degenerate on this synthetic corpus)
    val evalBase = docs.filter(col("doc_id") % 10 === 0).localCheckpoint(true)
    def dayEval(day: Int) =
      evalBase.select((col("doc_id") + day.toLong * 1000000L).as("doc_id"),
        (if (day == 0) col("text")
         else regexp_replace(col("text"), "(\\S+)", "$1" + s"·d$day")).as("text"))

    // fixed batch: non-eval docs + planted copies of day-0 eval content
    val batch = docs.filter(col("doc_id") % 10 =!= 0)
      .unionByName(evalBase.select((col("doc_id") + 900000000L).as("doc_id"),
        col("text")))
      .localCheckpoint(true)
    val nBatch = batch.count()

    val idx = s"/tmp/graft_soak_dcidx_$label"
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(idx), true)
    graft.ext.Curation.buildDecontamIndex(dayEval(0), "doc_id", "text", idx,
      shingleN = 5)

    def shingleFiles(): Int =
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$idx/shingles"))
        .count(_.getPath.getName.endsWith(".parquet"))

    def classifyTimed(): (Double, Long) = {
      val t = System.nanoTime()
      val surviving = graft.ext.Curation.decontaminateIncremental(
        batch, "doc_id", "text", idx, shingleN = 5).count()
      ((System.nanoTime() - t) / 1e9, surviving)
    }

    val (_, survivors0) = classifyTimed()
    val daySecs = (1 to days).map { day =>
      graft.ext.Curation.appendDecontamIndex(dayEval(day), "doc_id", "text",
        idx, shingleN = 5)
      val (sec, surviving) = classifyTimed()
      assert(surviving == survivors0,
        s"day $day: $surviving survivors != day-0 $survivors0 — disjoint-" +
          "shingle day evals must not change which batch rows survive")
      if (day <= 3 || day % 10 == 0 || day > days - 3)
        println(f"SOAK_DC day=$day%3d classify_sec=$sec%.2f " +
          f"shingle_files=${shingleFiles()} surviving=$surviving")
      sec
    }

    val (fragSec, _) = classifyTimed()
    val filesBefore = shingleFiles()
    val tC = System.nanoTime()
    graft.ext.Curation.compactDecontamIndex(spark, idx, shingleN = 5)
    val compactSec = (System.nanoTime() - tC) / 1e9
    val filesAfter = shingleFiles()
    val (compSec, survivorsC) = classifyTimed()
    assert(survivorsC == survivors0, "compaction changed classify results")

    val firstAvg = daySecs.take(3).sum / math.min(3, daySecs.size)
    val lastAvg = daySecs.takeRight(3).sum / math.min(3, daySecs.size)
    println(f"SOAK_DC_SUMMARY label=$label batch_docs=$nBatch days=$days " +
      f"eval_docs_per_day=${evalBase.count()} first3_avg_sec=$firstAvg%.2f " +
      f"last3_avg_sec=$lastAvg%.2f frag_classify_sec=$fragSec%.2f " +
      f"files_before=$filesBefore compact_sec=$compactSec%.2f " +
      f"files_after=$filesAfter compacted_classify_sec=$compSec%.2f")
    spark.stop()
  }
}
