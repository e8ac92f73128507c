package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** 100-day append/classify soak for the PERSISTED media-dedup signature
  * index — the [[ScaleBloomSoak]] protocol applied to the newest index
  * family (the layout behind
  * [[graft.streaming.Streams.ingestImageDedup]]/ingestVideoDedup/
  * ingestAudioDedup): disjoint signature batches arrive daily and admit
  * through [[graft.ext.Media.dhashDupIds]] against the stored table; the
  * SAME fixed probe batch is classified every day through the persisted
  * read path. Signatures are fed directly (xxhash64-spread 64-bit words —
  * the WAV/PNG/AVI→signature scan cost is the separately-measured
  * SCALE_MEDIA legs; this soak isolates the INDEX lifecycle). Design
  * claims under test:
  *  (1) classify cost is ONE column-pruned scan of the signature table
  *      plus a broadcast of the bounded probe batch — no shuffle at any
  *      corpus age, so per-day cost grows only with the raw scan
  *      (fixed-width rows, linear, reported per day with the table size);
  *  (2) append cost is flat — the admitted batch writes its own rows,
  *      never rewriting the table;
  *  (3) planted day-0/day-1 copies classify as dups on EVERY day (no
  *      false negatives, asserted);
  *  (4) end of soak: [[graft.ext.Media.compactSigIndex]] collapses ~1
  *      file/day to one file (timed), then
  *      [[graft.ext.Media.eraseSigIndex]] retires the day-0 ids and the
  *      day-0 plants must classify NOVEL afterwards while day-1 plants
  *      still flag (forgotten means forgotten — asserted).
  *
  * Usage: runMain graft.ScaleSigSoak <days> <perDay> <label>
  * Prints one SOAK_SIG line per sampled day + a SOAK_SIG_SUMMARY line.
  */
object ScaleSigSoak {
  def main(args: Array[String]): Unit = {
    val Array(daysS, perDayS, label) = args
    val days = daysS.toInt
    val perDay = perDayS.toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val fmt = "audiodedup:v1:windowMs=20:maxDist=3:bandBits=16"
    val root = s"/tmp/graft_soak_sig_$label/idx"
    val sigs = s"$root/sigs"
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root).getParent, true)

    // day-d arrivals: ids d·10M+i, signatures hashed from a day-disjoint
    // domain — distinct content every day, so table growth is real
    def dayBatch(day: Int) = spark.range(perDay).select(
      (col("id") + day.toLong * 10000000L).as("aid"),
      xxhash64(col("id") + day.toLong * 10000000L).as("afp"))

    // fixed probe: held-out novel signatures (a domain no day touches) +
    // planted copies of day-0 and day-1 content under fresh ids
    val nPlant = 57L
    val heldOut = spark.range(200).select(
      (col("id") + 900000000L).as("aid"),
      xxhash64(col("id") - 1000000000L).as("afp"))
    def plants(day: Int, idBase: Long) = spark.range(nPlant).select(
      (col("id") + idBase).as("aid"),
      xxhash64(col("id") * 17L + day.toLong * 10000000L).as("afp"))
    val probe = heldOut.unionByName(plants(0, 910000000L))
      .unionByName(plants(1, 920000000L)).localCheckpoint(true)
    val nProbe = probe.count()

    dayBatch(0).write.parquet(sigs)
    graft.ext.IndexFormat.stamp(spark, root, fmt)

    def classifyTimed(expectFloor: Long, tag: String): (Double, Long) = {
      val t = System.nanoTime()
      val dups = graft.ext.Media.dhashDupIds(probe, "aid", "afp",
        spark.read.parquet(sigs), "afp").count()
      val sec = (System.nanoTime() - t) / 1e9
      assert(dups >= expectFloor,
        s"$tag: $dups flagged < $expectFloor planted dups — false negative")
      (sec, dups)
    }

    classifyTimed(nPlant, "day 0")
    val daySecs = (1 to days).map { day =>
      val batch = dayBatch(day)
      val tA = System.nanoTime()
      graft.ext.IndexFormat.check(spark, root, fmt)
      val admitted = batch.join(
        graft.ext.Media.dhashDupIds(batch, "aid", "afp",
          spark.read.parquet(sigs), "afp"), Seq("aid"), "left_anti")
        .localCheckpoint(true)
      graft.ext.IndexFormat.invalidate(spark, root)
      admitted.write.mode(org.apache.spark.sql.SaveMode.Append).parquet(sigs)
      graft.ext.IndexFormat.stamp(spark, root, fmt)
      val appendSec = (System.nanoTime() - tA) / 1e9
      // from day 1 on both plant sets are in the table
      val (sec, dups) = classifyTimed(nPlant * 2, s"day $day")
      if (day <= 3 || day % 10 == 0 || day > days - 3)
        println(f"SOAK_SIG day=$day%3d append_sec=$appendSec%.2f " +
          f"classify_sec=$sec%.2f flagged=$dups " +
          f"sig_rows=${(day + 1) * perDay}")
      sec
    }

    // maintenance: compact ~1 file/day to one file, then erase day 0
    val tC = System.nanoTime()
    graft.ext.Media.compactSigIndex(spark, root)
    val compactSec = (System.nanoTime() - tC) / 1e9
    val nFiles = fs.listStatus(new org.apache.hadoop.fs.Path(sigs))
      .count(_.getPath.getName.endsWith(".parquet"))
    val (postCompactSec, _) = classifyTimed(nPlant * 2, "post-compact")

    val tE = System.nanoTime()
    graft.ext.Media.eraseSigIndex(spark, root, "aid",
      spark.range(perDay).select(col("id").as("aid")))
    val eraseSec = (System.nanoTime() - tE) / 1e9
    val day0After = graft.ext.Media.dhashDupIds(plants(0, 910000000L),
      "aid", "afp", spark.read.parquet(sigs), "afp").count()
    val day1After = graft.ext.Media.dhashDupIds(plants(1, 920000000L),
      "aid", "afp", spark.read.parquet(sigs), "afp").count()
    assert(day0After == 0, s"erase left day-0 plants flagged: $day0After")
    assert(day1After == nPlant, s"erase lost day-1 dups: $day1After")

    val firstAvg = daySecs.take(3).sum / math.min(3, daySecs.size)
    val lastAvg = daySecs.takeRight(3).sum / math.min(3, daySecs.size)
    println(f"SOAK_SIG_SUMMARY label=$label days=$days per_day=$perDay " +
      f"probe_rows=$nProbe first3_avg_sec=$firstAvg%.2f " +
      f"last3_avg_sec=$lastAvg%.2f compact_sec=$compactSec%.2f " +
      f"files_after_compact=$nFiles post_compact_classify_sec=$postCompactSec%.2f " +
      f"erase_sec=$eraseSec%.2f day0_after_erase=$day0After " +
      f"day1_after_erase=$day1After")
    spark.stop()
  }
}
