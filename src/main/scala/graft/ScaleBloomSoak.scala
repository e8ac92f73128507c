package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** 100-day append/classify soak for the PERSISTED Bloom bitmap — the
  * [[ScaleDecontamSoak]] protocol applied to [[graft.ext.Bloom]]'s
  * stored-index lifecycle (`writeBits`/`readBits`/`orInto`, the exact ops
  * behind the `bloomAppend` config path and
  * [[graft.streaming.Streams.ingestBloomDedup]]): disjoint-content
  * batches arrive daily and OR into the stored bitmap; the SAME fixed
  * batch is classified every day through the persisted read path. Design
  * claims under test:
  *  (1) per-day classify stays FLAT at any corpus age — the corpus is
  *      represented by the same m/8-byte bitmap no matter how many days
  *      fed it (there is nothing to compact: the artifact never grows);
  *  (2) append cost is flat too — build(day) + a fixed-size OR + rewrite;
  *  (3) true duplicates are flagged on EVERY day (no false negatives,
  *      asserted); flagged-count growth beyond the planted dups is false
  *      positives only, priced by the printed fill-rate column.
  *
  * End of soak: the documented erasure path — rebuild from survivors
  * (here: drop the day-0 shard, rebuild from days 1..N, the `bloomRebuild`
  * config op) — is timed, and the planted day-0 dups must flag NOVEL
  * afterwards while later-day dups still flag (asserted).
  *
  * Usage: runMain graft.ScaleBloomSoak <sfDir> <days> <label>
  * Prints one SOAK_BLOOM line per sampled day + a SOAK_BLOOM_SUMMARY line.
  */
object ScaleBloomSoak {
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
    // day-d arrivals carry a ·dD token suffix: disjoint content from every
    // other day, so corpus growth is real
    val dayBase = docs.filter(col("doc_id") % 5 =!= 0).localCheckpoint(true)
    def dayBatch(day: Int) =
      dayBase.select((col("doc_id") + day.toLong * 1000000L).as("doc_id"),
        (if (day == 0) col("text")
         else regexp_replace(col("text"), "(\\S+)", "$1" + s"·d$day")).as("text"))

    // fixed classify batch: held-out docs (never ingested) + planted
    // copies of day-0 content (true dups from day 0 on) + planted copies
    // of day-1 content (true dups from day 1 on)
    val heldOut = docs.filter(col("doc_id") % 5 === 0)
    val day0Dups = dayBase.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 900000000L).as("doc_id"), col("text"))
    val day1Dups = dayBase.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 910000000L).as("doc_id"),
        regexp_replace(col("text"), "(\\S+)", "$1·d1").as("text"))
    val batch = heldOut.unionByName(day0Dups).unionByName(day1Dups)
      .localCheckpoint(true)
    val nBatch = batch.count()
    val nPlanted = day0Dups.count()

    // m sized for the EVENTUAL corpus (days × dayBase): ~100 days × ~4k
    // docs at sf0.01 ≈ 400k docs → 2^22 bits at k=7 ≈ 1% FP when full
    val m = 1L << 22
    val k = 7
    val bitsPath = s"/tmp/graft_soak_bloom_$label/bits"
    val fs = new org.apache.hadoop.fs.Path(bitsPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(bitsPath).getParent, true)

    graft.ext.Bloom.writeBits(spark, bitsPath,
      graft.ext.Bloom.build(dayBatch(0), "text", k, m))

    def classifyTimed(): (Double, Long) = {
      val t = System.nanoTime()
      val bits = graft.ext.Bloom.readBits(spark, bitsPath)
      val flagged = graft.ext.Bloom.flagDuplicates(batch, "text", bits, k, m)
        .filter(col("maybe_dup")).count()
      ((System.nanoTime() - t) / 1e9, flagged)
    }
    def fillPct(): Double = {
      val bits = graft.ext.Bloom.readBits(spark, bitsPath)
      bits.map(java.lang.Long.bitCount).map(_.toLong).sum * 100.0 / m
    }

    val (_, flagged0) = classifyTimed()
    assert(flagged0 >= nPlanted,
      s"day 0: $flagged0 flagged < $nPlanted planted day-0 dups — false negative")
    val daySecs = (1 to days).map { day =>
      val tA = System.nanoTime()
      graft.ext.Bloom.writeBits(spark, bitsPath, graft.ext.Bloom.orInto(
        graft.ext.Bloom.readBits(spark, bitsPath),
        graft.ext.Bloom.build(dayBatch(day), "text", k, m)))
      val appendSec = (System.nanoTime() - tA) / 1e9
      val (sec, flagged) = classifyTimed()
      // no false negatives, ever: day-0 and (from day 1) day-1 plants flag
      val floor = nPlanted * 2
      assert(flagged >= floor,
        s"day $day: $flagged flagged < $floor planted dups — false negative")
      if (day <= 3 || day % 10 == 0 || day > days - 3)
        println(f"SOAK_BLOOM day=$day%3d append_sec=$appendSec%.2f " +
          f"classify_sec=$sec%.2f flagged=$flagged fill_pct=${fillPct()}%.2f")
      sec
    }

    // erasure: rebuild from survivors (drop day 0, keep days 1..N) — the
    // bloomRebuild config path; day-0 plants must flag novel afterwards
    val tR = System.nanoTime()
    val survivors = (1 to days).map(dayBatch).reduce(_ unionByName _)
    graft.ext.Bloom.writeBits(spark, bitsPath,
      graft.ext.Bloom.build(survivors, "text", k, m))
    val rebuildSec = (System.nanoTime() - tR) / 1e9
    val bitsR = graft.ext.Bloom.readBits(spark, bitsPath)
    val day0After = graft.ext.Bloom.flagDuplicates(day0Dups, "text", bitsR, k, m)
      .filter(col("maybe_dup")).count()
    val day1After = graft.ext.Bloom.flagDuplicates(day1Dups, "text", bitsR, k, m)
      .filter(col("maybe_dup")).count()
    assert(day1After == nPlanted, s"rebuild lost day-1 dups: $day1After")

    val firstAvg = daySecs.take(3).sum / math.min(3, daySecs.size)
    val lastAvg = daySecs.takeRight(3).sum / math.min(3, daySecs.size)
    println(f"SOAK_BLOOM_SUMMARY label=$label batch_docs=$nBatch days=$days " +
      f"docs_per_day=${dayBase.count()} first3_avg_sec=$firstAvg%.2f " +
      f"last3_avg_sec=$lastAvg%.2f fill_pct=${fillPct()}%.2f " +
      f"rebuild_sec=$rebuildSec%.2f day0_flagged_after_erase=$day0After " +
      f"day1_flagged_after_erase=$day1After planted_per_day=$nPlanted")
    spark.stop()
  }
}
