package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling measurement for the real-codec media tier: decode+dHash over a
  * corpus of N real PNGs at 1× and `mult`×, plus the band-join pair stage
  * over the resulting hashes. The design claims under test: decode is a
  * per-row codec call with NO shuffle (cost must scale ~linearly with
  * rows, embarrassingly parallel), and [[graft.ext.Media.dhashNearPairs]]
  * shuffles only fixed-width (band, key, id, hash) rows — so pair-finding
  * cost tracks candidate-pair count, never N².
  *
  * Usage: runMain graft.ScaleMedia <mult> <label> [nopairs|audio]
  * (base = 2,000 images). `nopairs` skips the pair stage — the synthetic
  * pattern family is deliberately self-similar, so emitted-pair count
  * grows ~quadratically with corpus and at 100× the pair stage measures
  * the fixture's density, not the join (the 10× point + the PlanShapeSpec
  * equi-join pin carry the pair-stage story).
  * `audio` measures the OTHER per-row scan legs instead: imageStats over
  * the PNG corpus and audioEnergy over a WAV corpus (base = 2,000 clips,
  * 16 kHz mono ~0.5 s each) — both shuffle-free per-row scans whose cost
  * must stay linear in payload bytes.
  * `video` measures [[graft.ext.Media.videoNearPairs]] on its real input
  * shape (a frame-hash table; base = 20,000 videos × 8 frames): groups
  * of 4 share all content frames (emitted pairs linear in N) and every
  * video carries one N-frequency intro frame that must die in the
  * broadcast-anti-join df-cap — the claim is pair cost tracks candidate
  * pairs, and the hot key never reaches the self-join.
  * Prints one SCALE_MEDIA (or SCALE_MEDIA_AUDIO / SCALE_MEDIA_VIDEO) line.
  */
object ScaleMedia {
  def main(args: Array[String]): Unit = {
    val (multS, label, mode) = args match {
      case Array(m, l) => (m, l, "full")
      case Array(m, l, md) => (m, l, md)
    }
    val doPairs = mode == "full"
    val mult = multS.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val nBase = 2000L
    val n = nBase * mult

    if (mode == "audio") {
      // image-stats leg: same PNG corpus as the decode leg
      val ids0 = spark.range(n).select(col("id"),
        (col("id") / 2).cast("long").as("k"), (col("id") % 2).cast("int").as("p"))
        .repartition(cpus.toInt)
      val pngs = graft.ext.Media.genPatternPngs(ids0, "id", "k", "p",
        w = 48, h = 40).localCheckpoint(true)
      val t0 = System.nanoTime()
      val nStats = graft.ext.Media.imageStats(pngs, "id", "content")
        .filter(col("luma_min") < col("luma_max")).count()
      val statsSec = (System.nanoTime() - t0) / 1e9

      // audio leg: 16 kHz mono clips, 8,000 frames (~0.5 s) each, windowed
      // at 25 ms -> ~32 windows and 8k real sample reads per clip
      val clips = spark.range(n).select(col("id"),
        lit(16000).as("rate"), lit(1).as("ch"), lit(8000).as("frames"))
        .repartition(cpus.toInt)
      val wavs = graft.ext.Media.genWavs(clips, "id", "rate", "ch", "frames")
        .localCheckpoint(true)
      val t1 = System.nanoTime()
      val nWin = graft.ext.Media.audioEnergy(wavs, "id", "content",
        windowMs = 25).count()
      val energySec = (System.nanoTime() - t1) / 1e9

      println(f"SCALE_MEDIA_AUDIO label=$label images=$n stats_sec=$statsSec%.2f " +
        f"stats_imgs_per_sec=${nStats / statsSec}%.0f clips=$n windows=$nWin " +
        f"energy_sec=$energySec%.2f samples_per_sec=${n * 8000 / energySec}%.0f")
      spark.stop()
      return
    }
    if (mode == "video") {
      // frame-TABLE scaling for videoNearPairs (decode cost is the other
      // legs' story — this measures the pairing operator on its real
      // input shape): base 20,000 videos × 8 frames. Groups of 4 videos
      // share all 7 content frames (posting lists bounded at 4, emitted
      // pairs = 6·N/4 — LINEAR in N), and every video opens with the
      // SAME intro frame — the crawl black-frame case — whose posting
      // list is N long and must die in the broadcast-anti-join df-cap,
      // never reach the self-join (a count-window cap would funnel all N
      // rows through one task here). Hashes go through xxhash64 so the
      // synthetic keys spread like real dHashes.
      val nV = nBase * 10 * mult
      val frames = spark.range(nV).select(col("id").as("vid"),
          explode(sequence(lit(0), lit(7))).as("f"))
        .select(col("vid"),
          when(col("f") === 0, xxhash64(lit(-1L)))
            .otherwise(xxhash64((floor(col("vid") / 4) * 8).cast("long")
              + col("f"))).as("h"))
        .repartition(cpus.toInt).localCheckpoint(true)
      val t0 = System.nanoTime()
      val nPairs = graft.ext.Media.videoNearPairs(frames, "vid", "h",
        minShared = 2, maxHashFreq = 1000).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"SCALE_MEDIA_VIDEO label=$label videos=$nV frames=${nV * 8} " +
        f"pairs=$nPairs pair_sec=$sec%.2f pairs_per_sec=${nPairs / sec}%.0f")
      spark.stop()
      return
    }
    // 48x40 gray patterns (realistic thumbnail-ish size, 1920 px decoded
    // per image); every other image is a perturbed near-dup of its even
    // neighbor, so the pair stage has real work at every scale
    val ids = spark.range(n).select(col("id"),
      (col("id") / 2).cast("long").as("k"), (col("id") % 2).cast("int").as("p"))
      .repartition(cpus.toInt)
    val media = graft.ext.Media.genPatternPngs(ids, "id", "k", "p", w = 48, h = 40)
      .localCheckpoint(true) // encode cost OUT of the decode clock

    val t0 = System.nanoTime()
    val hashed = graft.ext.Media.decodeImageMeta(media, "id", "content")
      .select(col("id"), col("dhash")).localCheckpoint(true)
    val decodeSec = (System.nanoTime() - t0) / 1e9

    val (pairSec, pairs) = if (doPairs) {
      val t1 = System.nanoTime()
      val p = graft.ext.Media.dhashNearPairs(hashed, "id", "dhash",
        maxDist = 3).count()
      ((System.nanoTime() - t1) / 1e9, p)
    } else (-1.0, -1L)

    println(f"SCALE_MEDIA label=$label images=$n decode_hash_sec=$decodeSec%.2f " +
      f"images_per_sec=${n / decodeSec}%.0f pair_join_sec=$pairSec%.2f pairs=$pairs")
    spark.stop()
  }
}
