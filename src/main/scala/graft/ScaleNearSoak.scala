package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Multi-day soak for the incremental near-dedup index — the measurement
  * [[ScaleNearIncremental]] cannot make: that harness classifies ONE batch
  * against a fresh index, so it certifies classify-vs-corpus-size but says
  * nothing about what N days of [[graft.ext.Dedup.appendNearIndex]] do to
  * the index itself. This runs the real daily loop — classify a fixed-size
  * batch, append the admissions to corpus + index — for `days` days, and
  * records per day: classify seconds, admitted count, and the parquet file
  * count of `buckets/` (every append adds files; at day ~365 an uncompacted
  * index's scan is listing-bound, which is what [[graft.ext.Dedup
  * .compactNearIndex]] exists to fix). After the loop it measures one more
  * classify on the fragmented index, compacts, and classifies again — the
  * before/after pair that prices compaction and its payoff.
  *
  * Day-d batch = `batchSize/2` verbatim copies of base docs (dup_corpus —
  * cross-rescore point lookups) + `batchSize/2` day-suffixed novels
  * (admitted — these grow the index, so day N classifies against
  * corpus + (N-1)·batchSize/2 appended docs). Novel suffix carries the day
  * number so each day's novels are near-dups of nothing before them.
  *
  * Usage: runMain graft.ScaleNearSoak <baseSfDir> <days> <batchSize> <label>
  * Prints one `SOAK day=…` line per day and a final `SOAK_SUMMARY` line.
  */
object ScaleNearSoak {
  def main(args: Array[String]): Unit = {
    val Array(baseSfDir, daysS, batchS, label) = args
    val days = daysS.toInt
    val batchSize = batchS.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = spark.read.parquet(s"$baseSfDir/documents.parquet")
      .select("doc_id", "text").localCheckpoint(true)
    val nBase = base.count()

    val idx = s"/tmp/graft_soak_nearidx_$label"
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(idx), true)
    graft.ext.Dedup.buildNearIndex(base, "doc_id", "text", idx)

    def parquetFiles(sub: String): Int =
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$idx/$sub"))
        .count(_.getPath.getName.endsWith(".parquet"))

    val half = batchSize / 2
    def dayBatch(day: Int) = {
      val copies = base.orderBy("doc_id").limit(half)
        .select((col("doc_id") + 50000000L + day * 100000L).as("doc_id"), col("text"))
      val novels = base.orderBy(col("doc_id").desc).limit(half)
        .select((col("doc_id") + 60000000L + day * 100000L).as("doc_id"),
          array_join(transform(split(col("text"), "\\s+"),
            t => concat(t, lit(s"·q$day"))), " ").as("text"))
      copies.unionByName(novels).localCheckpoint(true)
    }

    // eager localCheckpoint forces full materialization inside the clock;
    // the checkpointed frame then feeds both the verdict tally and the
    // admitted-side append without re-running the classify
    def classifyTimed(batch: org.apache.spark.sql.DataFrame): (Double, org.apache.spark.sql.DataFrame) = {
      val t = System.nanoTime()
      val v = graft.ext.Dedup
        .nearDedupIncremental(batch, "doc_id", "text", idx, minJaccard = 0.5)
        .localCheckpoint(true)
      ((System.nanoTime() - t) / 1e9, v)
    }

    val daySecs = (1 to days).map { day =>
      val batch = dayBatch(day)
      val (sec, v) = classifyTimed(batch)
      val verdicts = v.groupBy("verdict").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val admitted = batch.join(
        v.filter(col("verdict") === "admitted").select(col("id").as("doc_id")),
        Seq("doc_id"), "left_semi").localCheckpoint(true)
      graft.ext.Dedup.appendNearIndex(admitted, "doc_id", "text", idx)
      println(f"SOAK day=$day%3d classify_sec=$sec%.2f " +
        f"buckets_files=${parquetFiles("buckets")} " +
        f"shingles_files=${parquetFiles("shingles")} verdicts=$verdicts")
      sec
    }

    // fragmented vs compacted: same batch, same index contents
    val probe = dayBatch(days + 1)
    val (fragSec, _) = classifyTimed(probe)
    val filesBefore = parquetFiles("buckets") + parquetFiles("shingles")
    val tC = System.nanoTime()
    graft.ext.Dedup.compactNearIndex(spark, idx)
    val compactSec = (System.nanoTime() - tC) / 1e9
    val filesAfter = parquetFiles("buckets") + parquetFiles("shingles")
    val (compSec, _) = classifyTimed(probe)

    val firstAvg = daySecs.take(3).sum / math.min(3, daySecs.size)
    val lastAvg = daySecs.takeRight(3).sum / math.min(3, daySecs.size)
    println(f"SOAK_SUMMARY label=$label base_rows=$nBase days=$days " +
      f"batch=$batchSize first3_avg_sec=$firstAvg%.2f last3_avg_sec=$lastAvg%.2f " +
      f"frag_classify_sec=$fragSec%.2f files_before=$filesBefore " +
      f"compact_sec=$compactSec%.2f files_after=$filesAfter " +
      f"compacted_classify_sec=$compSec%.2f")
    spark.stop()
  }
}
