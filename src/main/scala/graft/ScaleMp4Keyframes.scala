package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the MP4 keyframe-sampling economy the `stss`/fragment tier
  * exists for: scene representatives from [[graft.ext.Media.mp4Keyframes]]
  * (decode ONLY the sync samples' byte ranges) versus the full
  * [[graft.ext.Media.videoFrames]] walk + per-frame decode the AVI tier
  * needs. The AVI pipeline must decode EVERY frame to find scene cuts from
  * dHash distances; the MP4 pipeline reads the container's own sync table,
  * so its cost scales with keyframe count, not duration — the difference
  * between 10⁵ decodes and a handful for an hour-long crawl outlier.
  *
  * Usage: runMain graft.ScaleMp4Keyframes <videos> <framesList> <step> <label>
  *   e.g. 32 60,240,960 12 r18
  * Prints one KF_ECON line per frame count (full vs keyframe seconds).
  */
object ScaleMp4Keyframes {
  def main(args: Array[String]): Unit = {
    val Array(videosS, framesList, stepS, label) = args
    val nVideos = videosS.toInt
    val step = stepS.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    framesList.split(",").map(_.trim.toInt).foreach { nFrames =>
      val ids = spark.range(nVideos).select(
        col("id"), col("id").as("k"),
        lit(nFrames).cast("int").as("n"), lit(step).cast("int").as("s"))
      // materialize generation OUTSIDE the timed region: both paths read
      // the same persisted binaries, so the measured delta is decode only
      val media = graft.ext.Media
        .genPatternMp4sKeyframed(ids, "id", "k", "n", "s", w = 9, h = 8)
        .localCheckpoint(true)
      def time(f: => Long): (Double, Long) = {
        val t = System.nanoTime()
        val rows = f
        ((System.nanoTime() - t) / 1e9, rows)
      }
      // warm both paths once (JIT/codegen), then measure
      graft.ext.Media.videoFrames(media, "id", "content").count()
      graft.ext.Media.mp4Keyframes(media, "id", "content").count()
      val (fullSec, fullRows) = time(
        graft.ext.Media.videoFrames(media, "id", "content").count())
      val (kfSec, kfRows) = time(
        graft.ext.Media.mp4Keyframes(media, "id", "content").count())
      println(f"KF_ECON label=$label videos=$nVideos frames=$nFrames " +
        f"step=$step full_rows=$fullRows full_sec=$fullSec%.2f " +
        f"kf_rows=$kfRows kf_sec=$kfSec%.2f speedup=${fullSec / kfSec}%.1f")
    }
    spark.stop()
  }
}
