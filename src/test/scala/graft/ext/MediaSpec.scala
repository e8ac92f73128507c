package graft.ext

import graft.SparkSpec

/** Real-codec media tier: JDK ImageIO decode (PNG lossless round-trip,
  * JPEG/RGB band handling), dHash invariants, band-join near-dup pairs,
  * WAV header parse round-trip, and time-based audio windowing.
  */
class MediaSpec extends SparkSpec {
  import spark.implicits._

  private def pattern(k: Long, p: Int, w: Int, h: Int): Array[Int] =
    Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      val base = ((k * 31 + x.toLong * x * 3 + y.toLong * y * 5 +
        x.toLong * y * 7) % 256).toInt
      (base + (if (p != 0 && (x + y * w) % 29 == 0) 1 else 0)) % 256
    }

  test("gray PNG encode→ImageIO decode is the identity on pixels") {
    val px = pattern(5L, 0, 9, 8)
    val bytes = Media.encodeGrayPng(px, 9, 8)
    assert(Media.sniffMime(bytes) == "image/png")
    val (w, h, bands, got) = Media.decodeLuma(bytes)
    assert((w, h, bands) == (9, 8, 1))
    assert(got.toSeq == px.toSeq)
  }

  test("decodeImageMeta reads real dimensions/bands from PNG and JPEG") {
    // an RGB PNG (3 bands) and a JPEG, both decoded by the real codec
    val img = new java.awt.image.BufferedImage(7, 5,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 5; x <- 0 until 7)
      img.setRGB(x, y, (x * 40 << 16) | (y * 50 << 8) | 99)
    def enc(fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }
    val df = Seq((1L, enc("png")), (2L, enc("jpg"))).toDF("id", "content")
    val out = Media.decodeImageMeta(df, "id", "content")
      .select("id", "width", "height", "channels", "mime")
      .as[(Long, Int, Int, Int, String)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, 7, 5, 3, "image/png"), (2L, 7, 5, 3, "image/jpeg")))
  }

  test("luma of a gray pixel is exactly the gray value") {
    for (v <- Seq(0, 1, 127, 128, 254, 255))
      assert(Media.luma(v, v, v) == v)
  }

  test("blockMean upscale is nearest-pixel (dHash defined below 9x8)") {
    // 2x2 grid upscaled to 4x2: each source pixel replicated twice in x
    val got = Media.blockMean(Array(10, 20, 30, 40), 2, 2, 4, 2).toSeq
    assert(got == Seq(10, 10, 20, 20, 30, 30, 40, 40))
  }

  test("dHash is invariant under its own block-mean resize") {
    // dHash internally block-means to 9x8; resizing to 9x8 first computes
    // the SAME means, so hash(resize(img)) == hash(img) for integer scales
    val px = pattern(11L, 0, 18, 16)
    val big = Seq((1L, Media.encodeGrayPng(px, 18, 16))).toDF("id", "content")
    val hBig = Media.decodeImageMeta(big, "id", "content")
      .select("dhash").as[Long].head()
    val small = Media.resizeImage(big, "id", "content", 9, 8)
    val hSmall = Media.decodeImageMeta(small, "id", "content")
      .select("dhash").as[Long].head()
    assert(hBig == hSmall)
  }

  test("resizeImage block means are exact integer tile averages") {
    val px = pattern(3L, 0, 18, 16)
    val df = Seq((1L, Media.encodeGrayPng(px, 18, 16))).toDF("id", "content")
    val outBytes = Media.resizeImage(df, "id", "content", 9, 8)
      .select("content").as[Array[Byte]].head()
    val (_, _, _, got) = Media.decodeLuma(outBytes)
    val want = Array.tabulate(72) { i =>
      val cx = i % 9; val cy = i / 9
      (px(2 * cy * 18 + 2 * cx) + px(2 * cy * 18 + 2 * cx + 1) +
        px((2 * cy + 1) * 18 + 2 * cx) + px((2 * cy + 1) * 18 + 2 * cx + 1)) / 4
    }
    assert(got.toSeq == want.toSeq)
  }

  test("dhashNearPairs equals the all-pairs Hamming filter (lossless bands)") {
    val docs = (0L until 40L).map(i => (i, i / 2, (i % 2).toInt)).toDF("id", "k", "p")
    val media = Media.genPatternPngs(docs, "id", "k", "p", 9, 8)
    val hashed = Media.decodeImageMeta(media, "id", "content").select("id", "dhash")
    val got = Media.dhashNearPairs(hashed, "id", "dhash", maxDist = 3)
      .as[(Long, Long, Long)].collect().toSet
    // reference: brute-force over collected hashes
    val hs = hashed.as[(Long, Long)].collect()
    val want = (for {
      (i, hi) <- hs; (j, hj) <- hs if i < j
      d = java.lang.Long.bitCount(hi ^ hj) if d <= 3
    } yield (i, j, d.toLong)).toSet
    assert(got == want)
    // the fixture really plants near-dup pairs (even, odd) per pattern
    assert(want.exists { case (l, r, _) => r == l + 1 && l % 2 == 0 })
  }

  test("AVI encode→parse round-trips the avih header through LIST nesting") {
    val bytes = Media.encodeAvi(usPerFrame = 33333, totalFrames = 250,
      streams = 2, width = 640, height = 480,
      movi = Array.tabulate[Byte](32)(_.toByte))
    assert(Media.sniffMime(bytes) == "video/avi")
    val m = Media.parseAvi(bytes)
    assert(m == Media.AviMeta(33333, 250, 2, 640, 480))
    intercept[IllegalArgumentException] { Media.parseAvi("nope".getBytes) }
    // a WAV is RIFF but not AVI — the sniff keeps them apart
    val wav = Media.encodeWav(8000, 1, Array.tabulate[Short](10)(_.toShort))
    intercept[IllegalArgumentException] { Media.parseAvi(wav) }
  }

  test("decodeVideoMeta derives integer fps and floor duration") {
    val df = Media.genAvis(
      Seq((1L, 41667, 2500, 320, 240)).toDF("id", "uspf", "frames", "w", "h"),
      "id", "uspf", "frames", "w", "h")
    val out = Media.decodeVideoMeta(df, "id", "content")
      .select("width", "height", "n_frames", "n_streams", "fps_x1000", "duration_ms")
      .as[(Int, Int, Int, Int, Long, Long)].head()
    // fps_x1000 = 1e9/41667 = 23999 (23.999 fps); duration = 41667*2500/1000
    assert(out == ((320, 240, 2500, 1, 23999L, 104167L)))
  }

  test("lenient decode quarantines garbage in place, keeps good rows exact") {
    val px = pattern(4L, 0, 9, 8)
    val df = Seq(
      (1L, Media.encodeGrayPng(px, 9, 8)),
      (2L, "definitely not a png".getBytes)).toDF("id", "content")
    val out = Media.decodeImageMetaLenient(df, "id", "content")
      .select("id", "decode_ok", "decode_err", "mime", "width")
      .as[(Long, Boolean, Option[String], String, Option[Int])]
      .collect().sortBy(_._1).toSeq
    assert(out(0) == ((1L, true, None, "image/png", Some(9))))
    assert(out(1) == ((2L, false, Some("IllegalArgumentException"),
      "application/octet-stream", None)))
    // good row's dhash equals the strict decoder's
    val strict = Media.decodeImageMeta(df.filter($"id" === 1L), "id", "content")
      .select("dhash").as[Long].head()
    val lenient = Media.decodeImageMetaLenient(df, "id", "content")
      .filter($"id" === 1L).select("dhash").as[Long].head()
    assert(strict == lenient)
  }

  test("WAV encode→parse round-trips the header facts") {
    val samples = Array.tabulate[Short](300)(i => (i * 13 % 256 - 128).toShort)
    val bytes = Media.encodeWav(16000, 2, samples)
    assert(Media.sniffMime(bytes) == "audio/wav")
    val m = Media.parseWav(bytes)
    assert(m.sampleRate == 16000 && m.channels == 2 && m.bitsPerSample == 16)
    assert(m.blockAlign == 4 && m.byteRate == 64000)
    assert(m.dataBytes == 600 && m.dataBytes / m.blockAlign == 150)
  }

  test("parseWav rejects non-WAV and truncates a lying data size") {
    intercept[IllegalArgumentException] {
      Media.parseWav("definitely not audio".getBytes)
    }
    // data chunk claims more bytes than exist → physical truncation wins
    val good = Media.encodeWav(8000, 1, Array.tabulate[Short](100)(_.toShort))
    val lying = good.clone()
    val bb = java.nio.ByteBuffer.wrap(lying)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(40, 100000) // data size field at offset 40 in canonical header
    assert(Media.parseWav(lying).dataBytes == 200)
  }

  test("decodeAudioMeta derives duration by integer floor") {
    val df = Media.genWavs(
      Seq((1L, 8000, 1, 123), (2L, 44100, 2, 999)).toDF("id", "rate", "ch", "frames"),
      "id", "rate", "ch", "frames")
    val out = Media.decodeAudioMeta(df, "id", "content")
      .select("id", "sample_rate", "channels", "bits", "n_frames", "duration_ms")
      .as[(Long, Int, Int, Int, Long, Long)].collect().sortBy(_._1).toSeq
    // duration = dataBytes*1000/byteRate = frames*1000/rate (floor)
    assert(out == Seq((1L, 8000, 1, 16, 123L, 123L * 1000 / 8000),
      (2L, 44100, 2, 16, 999L, 999L * 1000 / 44100)))
  }

  test("audioWindows cuts frame-aligned time windows with a ragged tail") {
    // 8000 Hz mono 16-bit: byteRate 16000, blockAlign 2; 25 ms -> 400 bytes
    val df = Media.genWavs(Seq((1L, 8000, 1, 450)).toDF("id", "rate", "ch", "frames"),
      "id", "rate", "ch", "frames")
    val out = Media.audioWindows(df, "id", "content", windowMs = 25)
      .select("window_idx", "start_ms", "n_bytes", "n_frames")
      .as[(Int, Long, Int, Int)].collect().sortBy(_._1).toSeq
    // 450 frames = 900 bytes -> windows of 400 bytes: 400, 400, 100
    assert(out == Seq((0, 0L, 400, 200), (1, 25L, 400, 200), (2, 50L, 100, 50)))
  }

  test("aHash64: constant image hashes to 0; one bright cell sets one bit") {
    // constant: no cell exceeds the mean -> all bits 0
    assert(Media.aHash64(Array.fill(64)(100), 8, 8) == 0L)
    // one bright pixel at (x=3, y=2) on an 8x8 grid: only that cell > mean
    val px = Array.fill(64)(10)
    px(2 * 8 + 3) = 200
    assert(Media.aHash64(px, 8, 8) == (1L << (2 * 8 + 3)))
  }

  test("aHash64 is invariant under exact 2x2 block-mean downscale") {
    // 16x16 -> 8x8 block means are exact, so hashing the 16x16 original
    // equals hashing its own 8x8 reduction
    val big = pattern(7L, 0, 16, 16)
    val small = Media.blockMean(big, 16, 16, 8, 8)
    assert(Media.aHash64(big, 16, 16) == Media.aHash64(small, 8, 8))
  }

  test("imageStats computes exact integer luma statistics") {
    val px = Array(0, 10, 20, 250) // 2x2
    val bytes = Media.encodeGrayPng(px, 2, 2)
    val df = Seq((1L, bytes)).toDF("id", "content")
    val got = Media.imageStats(df, "id", "content")
      .select("width", "height", "n_px", "luma_sum", "luma_sq_sum",
        "luma_min", "luma_max", "mean_milli")
      .as[(Int, Int, Int, Long, Long, Int, Int, Long)].head()
    assert(got == ((2, 2, 4, 280L, 100L + 400L + 62500L, 0, 250, 70000L)))
  }

  test("audioEnergy sums real squared samples per window, ragged tail") {
    // 8000 Hz mono 16-bit, 6 frames, 0.25 ms windows -> wBytes floors to
    // blockAlign=2 -> max(2, 16000*0/1000)=2 bytes = 1 sample per window
    val samples = Array[Short](3, -4, 0, 100, -100, 7)
    val wav = Media.encodeWav(8000, 1, samples)
    val df = Seq((1L, wav)).toDF("id", "content")
    val got = Media.audioEnergy(df, "id", "content", windowMs = 1)
      .select("window_idx", "n_samples", "sum_sq", "peak_abs")
      .as[(Int, Int, Long, Int)].collect().sortBy(_._1).toSeq
    // windowMs=1 at byteRate 16000 -> 16 bytes -> 8 samples, but only 6
    // present: one ragged window
    assert(got == Seq((0, 6, 9L + 16L + 0L + 10000L + 10000L + 49L, 100)))
  }

  test("audioEnergy window cut matches audioWindows geometry") {
    val df = Media.genWavs(Seq((1L, 8000, 2, 450)).toDF("id", "rate", "ch", "frames"),
      "id", "rate", "ch", "frames")
    val wins = Media.audioWindows(df, "id", "content", windowMs = 25)
      .select("window_idx", "start_ms", "n_frames")
      .as[(Int, Long, Int)].collect().sortBy(_._1).toSeq
    val en = Media.audioEnergy(df, "id", "content", windowMs = 25)
      .select("window_idx", "start_ms", "n_samples")
      .as[(Int, Long, Int)].collect().sortBy(_._1).toSeq
    assert(en.map(_._1) == wins.map(_._1))
    assert(en.map(_._2) == wins.map(_._2))
    // stereo: samples per window = 2 x frames per window
    assert(en.map(_._3) == wins.map(w => w._3 * 2))
  }
}
