package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** 100-day append/classify soak for the persisted SEMANTIC index — the
  * [[ScaleNearSoak]] protocol applied to [[graft.ext.Dedup.buildSemanticIndex]]:
  * build once over the base corpus, then every "day" classify a fixed-size
  * batch (half verbatim copies → dup_corpus, half day-signed novel vectors
  * → admitted), append the admissions, and time ONLY the classify.
  *
  * What flat means HERE (vs the near soak): near-dedup classify is
  * postings point-lookups — flat, full stop. SemDeDup classify compares
  * each batch row against its whole stored cell, so per-day cost grows
  * ∝ corpus/k as admissions accrete. The operational story this harness
  * measures is therefore three-part: (1) the creep is bounded by the
  * corpus growth factor (no file-count or fragmentation blow-up on top —
  * the soak's point); (2) compaction restores the file count without
  * changing results; (3) a REBUILD with k scaled to the grown corpus
  * returns classify to its day-1 cost — k is the scale lever, exactly as
  * the SemDeDup paper sizes it (~50k clusters at web scale).
  *
  * Day-signed novels: day d's novel vectors are the base vectors
  * element-wise multiplied by a ±1 pattern keyed on (d, i), so they are
  * near-orthogonal to the originals AND to every other day's novels —
  * each day really adds admissions instead of re-matching yesterday's.
  *
  * Usage: runMain graft.ScaleSemanticSoak <sfDir> <days> <batch> <label>
  * Prints one SOAK_SEM line per day + a SOAK_SEM_SUMMARY line.
  */
object ScaleSemanticSoak {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, daysS, batchS, label) = args
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

    val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding").localCheckpoint(true)
    val nBase = base.count()
    val k0 = 64

    val idx = s"/tmp/graft_soak_semidx_$label"
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(idx), true)
    graft.ext.Dedup.buildSemanticIndex(base, "vec_id", "embedding", idx,
      k = k0, dim = 64)

    def vectorFiles(): Int =
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$idx/vectors"))
        .count(_.getPath.getName.endsWith(".parquet"))

    val half = batchSize / 2
    def dayBatch(day: Int) = {
      val copies = base.orderBy("vec_id").limit(half)
        .select((col("vec_id") + 50000000L + day * 100000L).as("vec_id"),
          col("embedding"))
      // day-signed novels: ±1 per (day, dim) — near-orthogonal to the
      // base AND to other days' novels, so each day admits fresh rows
      val novels = base.orderBy(col("vec_id").desc).limit(half)
        .select((col("vec_id") + 60000000L + day * 100000L).as("vec_id"),
          zip_with(col("embedding"),
            transform(sequence(lit(0), lit(63)),
              i => when(pmod(xxhash64(lit(day), i), lit(2)) === 0, 1.0f)
                .otherwise(-1.0f)),
            (x, s) => x * s).as("embedding"))
      copies.unionByName(novels).localCheckpoint(true)
    }

    def classifyTimed(batch: org.apache.spark.sql.DataFrame, kk: Int,
                      at: String = null):
        (Double, org.apache.spark.sql.DataFrame) = {
      val where = Option(at).getOrElse(idx)
      val t = System.nanoTime()
      val v = graft.ext.Dedup.semanticDedupIncremental(batch, "vec_id",
          "embedding", where, k = kk, dim = 64, threshold = 0.99)
        .localCheckpoint(true)
      ((System.nanoTime() - t) / 1e9, v)
    }

    val daySecs = (1 to days).map { day =>
      val batch = dayBatch(day)
      val (sec, v) = classifyTimed(batch, k0)
      val verdicts = v.groupBy("verdict").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val admitted = batch.join(
        v.filter(col("verdict") === "admitted").select(col("id").as("vec_id")),
        Seq("vec_id"), "left_semi").localCheckpoint(true)
      graft.ext.Dedup.appendSemanticIndex(admitted, "vec_id", "embedding",
        idx, k = k0, dim = 64)
      if (day <= 3 || day % 10 == 0 || day > days - 3)
        println(f"SOAK_SEM day=$day%3d classify_sec=$sec%.2f " +
          f"vector_files=${vectorFiles()} verdicts=$verdicts")
      sec
    }

    // fragmented vs compacted: same probe, same index contents
    val probe = dayBatch(days + 1)
    val (fragSec, _) = classifyTimed(probe, k0)
    val filesBefore = vectorFiles()
    val tC = System.nanoTime()
    graft.ext.Dedup.compactSemanticIndex(spark, idx, k = k0, dim = 64)
    val compactSec = (System.nanoTime() - tC) / 1e9
    val filesAfter = vectorFiles()
    val (compSec, _) = classifyTimed(probe, k0)

    // the k lever: rebuild over the grown corpus with k scaled by the
    // growth factor — classify must land back near its day-1 cost
    val grown = spark.read.parquet(s"$idx/vectors")
      .select(col("id").as("vec_id"), col("v").as("embedding"))
      .localCheckpoint(true)
    val nGrown = grown.count()
    val kScaled = math.max(k0, (k0.toLong * nGrown / math.max(nBase, 1L)).toInt)
    val idx2 = s"/tmp/graft_soak_semidx_${label}_rescaled"
    fs.delete(new org.apache.hadoop.fs.Path(idx2), true)
    val tR = System.nanoTime()
    graft.ext.Dedup.buildSemanticIndex(grown, "vec_id", "embedding", idx2,
      k = kScaled, dim = 64)
    val rebuildSec = (System.nanoTime() - tR) / 1e9
    val (rescaledSec, _) = classifyTimed(probe, kScaled, at = idx2)

    val firstAvg = daySecs.take(3).sum / math.min(3, daySecs.size)
    val lastAvg = daySecs.takeRight(3).sum / math.min(3, daySecs.size)
    println(f"SOAK_SEM_SUMMARY label=$label base_rows=$nBase days=$days " +
      f"batch=$batchSize first3_avg_sec=$firstAvg%.2f last3_avg_sec=$lastAvg%.2f " +
      f"grown_rows=$nGrown frag_classify_sec=$fragSec%.2f " +
      f"files_before=$filesBefore compact_sec=$compactSec%.2f " +
      f"files_after=$filesAfter compacted_classify_sec=$compSec%.2f " +
      f"k_scaled=$kScaled rebuild_sec=$rebuildSec%.2f " +
      f"rescaled_classify_sec=$rescaledSec%.2f")
    spark.stop()
  }
}
