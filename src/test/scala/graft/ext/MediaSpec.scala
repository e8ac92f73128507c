package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions.lit

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

  test("orientLuma applies all 8 EXIF transforms; unorient is its inverse") {
    // 3x2 display grid, distinct values — exhaustive index-permutation check
    val disp = Array(1, 2, 3, 4, 5, 6)
    for (o <- 1 to 8) {
      val (stored, sw, sh) = Media.unorientLuma(disp, 3, 2, o)
      if (o >= 5) assert((sw, sh) == ((2, 3))) else assert((sw, sh) == ((3, 2)))
      val (back, dw, dh) = Media.orientLuma(stored, sw, sh, o)
      assert((dw, dh) == ((3, 2)) && back.toSeq == disp.toSeq,
        s"orientation $o round trip failed")
    }
    // spot-check one concrete transform: o=6 (rotate 90 CW to display)
    // stored = display rotated 90 CCW: stored(x,y) = disp(dh-1-y ... just
    // verify first stored column equals first display row reversed
    val (st6, _, _) = Media.unorientLuma(disp, 3, 2, 6)
    // stored is 2x3; orient back already checked; concrete value check:
    // display(0,0)=1 must sit at stored(x=0, y=h-1-0=2) for o=6
    assert(st6(2 * 2 + 0) == 1)
  }

  test("EXIF orientation parses from PNG eXIf and JPEG APP1; absent -> 1") {
    val px = pattern(5L, 0, 9, 8)
    val png = Media.encodeGrayPng(px, 9, 8)
    assert(Media.exifOrientation(png) == 1)
    for (o <- 1 to 8)
      assert(Media.exifOrientation(Media.pngWithOrientation(png, o)) == o)
    // JPEG carrier
    val img = new java.awt.image.BufferedImage(9, 8,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val jpeg = bos.toByteArray
    assert(Media.exifOrientation(jpeg) == 1)
    assert(Media.exifOrientation(Media.jpegWithOrientation(jpeg, 6)) == 6)
    assert(Media.sniffMime(Media.jpegWithOrientation(jpeg, 6)) == "image/jpeg")
    // garbage TIFF payload inside a valid chunk must degrade to 1, not throw
    assert(Media.exifOrientation("garbage".getBytes) == 1)
  }

  test("decode normalizes EXIF orientation: rotated copies hash identically") {
    val ids = (0L until 16L).map(i => (i, i / 8, 0, 1 + (i % 8).toInt))
      .toDF("id", "k", "p", "o")
    val media = Media.genPatternPngsOriented(ids, "id", "k", "p", "o", w = 9, h = 8)
    val got = Media.decodeImageMeta(media, "id", "content")
      .select("id", "width", "height", "dhash")
      .as[(Long, Int, Int, Long)].collect().sortBy(_._1)
    // every orientation of the same pattern returns DISPLAY dims 9x8 and
    // the same dhash as the plain (o=1) encode — the recall hole is closed
    val plain = Media.decodeImageMeta(
      Media.genPatternPngs(Seq((0L, 0L, 0), (8L, 1L, 0)).toDF("id", "k", "p"),
        "id", "k", "p", 9, 8), "id", "content")
      .select("id", "dhash").as[(Long, Long)].collect().sortBy(_._1)
    got.foreach { case (id, w, h, dh) =>
      assert((w, h) == ((9, 8)))
      assert(dh == plain(if (id < 8) 0 else 1)._2, s"id $id hash mismatch")
    }
    // sanity: without normalization the stored grids really differ — the
    // o=6 stored PNG decoded as-is (strip the eXIf via re-encode) differs
    val (sw, sh, _, spx) = {
      val stored = Media.unorientLuma(pattern(0L, 0, 9, 8), 9, 8, 6)
      (stored._2, stored._3, 0, stored._1)
    }
    assert((sw, sh) == ((8, 9)) && Media.dHash64(spx, sw, sh) != plain(0)._2)
  }

  test("lenient audio decode quarantines malformed payloads in place") {
    val good = Media.genWavs(Seq((0L, 8000, 1, 100)).toDF("id", "rate", "ch", "frames"),
      "id", "rate", "ch", "frames")
    val bad = Seq((1L, "not audio at all".getBytes),
      (2L, null: Array[Byte])).toDF("id", "content")
    val out = Media.decodeAudioMetaLenient(good.unionByName(bad), "id", "content")
      .select("id", "decode_ok", "decode_err", "sample_rate", "n_frames")
      .as[(Long, Boolean, Option[String], Option[Int], Option[Long])]
      .collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (0L, true, None, Some(8000), Some(100L)),
      (1L, false, Some("IllegalArgumentException"), None, None),
      (2L, false, Some("IllegalArgumentException"), None, None)))
    // good rows bit-equal to the strict path
    val strict = Media.decodeAudioMeta(good, "id", "content")
      .select("id", "sample_rate", "channels", "bits", "n_frames", "duration_ms")
      .as[(Long, Int, Int, Int, Long, Long)].head()
    val lenientGood = Media.decodeAudioMetaLenient(good, "id", "content")
      .select("id", "sample_rate", "channels", "bits", "n_frames", "duration_ms")
      .as[(Long, Int, Int, Int, Long, Long)].head()
    assert(strict == lenientGood)
  }

  test("lenient video decode quarantines malformed payloads in place") {
    val good = Media.genAvis(
      Seq((0L, 33333, 50, 320, 240)).toDF("id", "uspf", "frames", "w", "h"),
      "id", "uspf", "frames", "w", "h")
    // a RIFF/AVI header with no avih: encodeAvi cannot make one, build raw
    val headerless = "RIFF   AVI ".getBytes("ISO-8859-1")
    val bad = Seq((1L, "garbage video".getBytes), (2L, headerless))
      .toDF("id", "content")
    val out = Media.decodeVideoMetaLenient(good.unionByName(bad), "id", "content")
      .select("id", "decode_ok", "decode_err", "width", "n_frames")
      .as[(Long, Boolean, Option[String], Option[Int], Option[Int])]
      .collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (0L, true, None, Some(320), Some(50)),
      (1L, false, Some("IllegalArgumentException"), None, None),
      (2L, false, Some("IllegalArgumentException"), None, None)))
  }

  test("videoFrames walks LIST(movi) and decodes every frame payload") {
    val df = Seq((1L, 3L, 2), (2L, 9L, 3)).toDF("id", "k", "n")
    val avis = Media.genPatternAvis(df, "id", "k", "n", w = 9, h = 8)
    // container sanity: still a valid AVI whose header decode works
    val meta = Media.decodeVideoMeta(avis, "id", "content")
      .select("id", "n_frames").as[(Long, Int)].collect().sortBy(_._1).toSeq
    assert(meta == Seq((1L, 2), (2L, 3)))
    val got = Media.videoFrames(avis, "id", "content")
      .select("id", "frame_idx", "width", "height", "dhash")
      .as[(Long, Int, Int, Int, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got.map(r => (r._1, r._2)) ==
      Seq((1L, 0), (1L, 1), (2L, 0), (2L, 1), (2L, 2)))
    // every frame's dhash equals the hash of its formula grid (k*8+f)
    got.foreach { case (id, f, w, h, dh) =>
      val k = if (id == 1L) 3L else 9L
      assert((w, h) == ((9, 8)))
      assert(dh == Media.dHash64(pattern(k * 8 + f, 0, 9, 8), 9, 8),
        s"frame ($id,$f)")
    }
  }

  test("zero-length data chunk yields zero windows in both window ops") {
    // regression: both ops used max(1, ceil) and emitted one EMPTY window
    // for dataBytes=0, diverging from the oracle's unnest-join (no row)
    val wav = Media.encodeWav(8000, 1, Array.empty[Short])
    val df = Seq((1L, wav)).toDF("id", "content")
    assert(Media.audioWindows(df, "id", "content", windowMs = 25).count() == 0)
    assert(Media.audioEnergy(df, "id", "content", windowMs = 25).count() == 0)
    // header facts still decode for the empty payload
    val meta = Media.decodeAudioMeta(df, "id", "content")
      .select("n_frames", "duration_ms").as[(Long, Long)].head()
    assert(meta == ((0L, 0L)))
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

  test("audioFingerprint is the energy-delta sign word; perturb flips bit 0 only") {
    val df = Seq((1L, 4L, 0, 65), (2L, 4L, 1, 65), (3L, 9L, 0, 65))
      .toDF("id", "k", "p", "nw")
    val fps = Media.audioFingerprint(
      Media.genToneWavs(df, "id", "k", "p", "nw"), "id", "content")
      .select($"id", $"n_windows", $"afp")
      .as[(Long, Int, Long)].collect().sortBy(_._1)
    assert(fps.forall(_._2 == 65))
    // hand-compute the expected fingerprint from the amplitude formula
    def amp(k: Long, w: Int): Int = ((k * 31 + w.toLong * w * 7 + w * 3) % 120).toInt + 1
    def fpOf(k: Long): Long =
      (0 until 64).foldLeft(0L)((acc, w) =>
        if (amp(k, w + 1) > amp(k, w)) acc | (1L << w) else acc)
    assert(fps(0)._3 == fpOf(4L))
    assert(fps(2)._3 == fpOf(9L))
    // the re-encode model: exactly bit 0 differs from the original
    assert((fps(0)._3 ^ fps(1)._3) == 1L)
    // gain invariance: doubling every sample leaves the fingerprint alone
    val loud = Media.genToneWavs(Seq((9L, 4L, 0, 65)).toDF("id", "k", "p", "nw"),
      "id", "k", "p", "nw")
    // (regenerate at double amplitude by hand: scale the PCM payload)
    val scaled = loud.select($"id", $"content").as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        val m = bytes.clone()
        val bb = java.nio.ByteBuffer.wrap(m).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        var off = m.length - 65 * 160 * 2
        while (off < m.length) {
          bb.putShort(off, (bb.getShort(off) * 2).toShort); off += 2
        }
        (id, m)
      }.toDF("id", "content")
    val fpLoud = Media.audioFingerprint(scaled, "id", "content")
      .select($"afp").as[Long].head()
    assert(fpLoud == fpOf(4L))
  }

  test("videoScenes cuts at planted boundaries and numbers scenes") {
    // k=3, 6 frames, scene length 2 → scenes 0,0,1,1,2,2: within-scene
    // frames are bit-identical (prev_dist 0), boundaries diverge
    val df = Seq((1L, 3L, 6, 2)).toDF("id", "k", "n", "len")
    val avis = Media.genSceneAvis(df, "id", "k", "n", "len", 9, 8)
    val frames = Media.videoFrames(avis, "id", "content")
    val got = Media.videoScenes(frames, "id", "frame_idx", "dhash", cutDist = 8)
      .select($"frame_idx", $"prev_dist", $"is_cut", $"scene_idx")
      .as[(Int, Option[Long], Boolean, Int)].collect().sortBy(_._1).toSeq
    assert(got.map(_._2) ==
      Seq(None, Some(0L), got(2)._2, Some(0L), got(4)._2, Some(0L)))
    // the planted boundaries really clear the threshold for this pattern
    assert(got(2)._2.exists(_ > 8) && got(4)._2.exists(_ > 8))
    assert(got.map(_._4) == Seq(0, 0, 1, 1, 2, 2))
    assert(got.map(_._3) == Seq(false, false, true, false, true, false))
    // one-frame-per-scene sampling: scene starts = frame 0 + every cut
    val sampled = Media.videoScenes(frames, "id", "frame_idx", "dhash", 8)
      .filter($"prev_dist".isNull || $"is_cut")
      .select($"frame_idx").as[Int].collect().sorted.toSeq
    assert(sampled == Seq(0, 2, 4))
  }

  test("videoNearPairs counts shared distinct frame hashes with true sizes") {
    // vid 1 = {10,20,30}; vid 2 = {10,20} (prefix clip); vid 3 = {20}
    // (one shared frame, below minShared); vid 4 = {10,20,30} (exact copy;
    // frame 20 appears twice — DISTINCT per video, so n_right stays 3)
    val frames = Seq(
      (1L, 10L), (1L, 20L), (1L, 30L),
      (2L, 10L), (2L, 20L),
      (3L, 20L),
      (4L, 10L), (4L, 20L), (4L, 20L), (4L, 30L)).toDF("vid", "h")
    val got = Media.videoNearPairs(frames, "vid", "h", minShared = 2)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got == Seq((1L, 2L, 2L, 3L, 2L), (1L, 4L, 3L, 3L, 3L),
      (2L, 4L, 2L, 2L, 3L)))
    // minShared boundary: at 3 only the full copy survives
    val strict = Media.videoNearPairs(frames, "vid", "h", minShared = 3)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(strict == Seq((1L, 4L, 3L, 3L, 3L)))
  }

  test("videoNearPairs maxHashFreq drops hot hashes from pairing, not sizes") {
    // hash 99 appears in all 5 videos (an intro/black frame); vids 1,2
    // also share {1,2}. At maxHashFreq=4 the hot hash contributes no pair
    // evidence: (1,2) pairs on n_shared=2 (under-count by design, doc'd),
    // while n_left/n_right keep the TRUE pre-cap distinct counts (3 each);
    // vids 3,4,5 shared only the hot frame and pair with nobody
    val frames = (1L to 5L).map(v => (v, 99L)).toDF("vid", "h")
      .unionByName(Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L)).toDF("vid", "h"))
    val capped = Media.videoNearPairs(frames, "vid", "h",
      minShared = 2, maxHashFreq = 4)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(capped == Seq((1L, 2L, 2L, 3L, 3L)))
    // cap boundary: at maxHashFreq=5 the hot hash survives and every
    // video pairs with 1 and 2 at minShared=1
    val loose = Media.videoNearPairs(frames, "vid", "h",
      minShared = 1, maxHashFreq = 5)
    assert(loose.count() == 10L) // C(5,2): all videos share hash 99
  }

  test("videoNearPairsClustered pairs re-encoded copies exact hashing misses") {
    // vid 1 = pattern 0 original; vid 2 = pattern 0 RE-ENCODED (perturb:
    // every frame's pixels bumped, dhash a few bits off); vid 3 unrelated
    // pattern; vid 4 = trim of pattern 0 (bit-identical frames)
    val df = Seq((1L, 0L, 0, 3), (2L, 0L, 1, 3), (3L, 9L, 0, 3),
      (4L, 0L, 0, 2)).toDF("id", "k", "p", "n")
    val avis = Media.genPatternAvisPerturbed(df, "id", "k", "p", "n", 9, 8)
    val frames = Media.videoFrames(avis, "id", "content")
    // the perturb is a guaranteed ONE-bit dHash flip: never identical,
    // always inside the band join's maxDist
    val hs = frames.select($"id", $"frame_idx", $"dhash")
      .as[(Long, Int, Long)].collect()
    val h1 = hs.filter(_._1 == 1L).sortBy(_._2).map(_._3)
    val h2 = hs.filter(_._1 == 2L).sortBy(_._2).map(_._3)
    assert(h1.zip(h2).forall { case (a, b) =>
      java.lang.Long.bitCount(a ^ b) == 1 })
    val exact = Media.videoNearPairs(frames, "id", "dhash", minShared = 2)
      .select("left_id", "right_id").as[(Long, Long)].collect().toSet
    assert(exact == Set((1L, 4L))) // only the trim pairs on raw hashes
    val clustered = Media.videoNearPairsClustered(frames, "id", "dhash",
      maxDist = 3, minShared = 2)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    // re-encode joins the family; the unrelated video stays out
    assert(clustered.map(t => (t._1, t._2)) ==
      Set((1L, 2L), (1L, 4L), (2L, 4L)))
    // counts are cluster-representative counts: 3-frame videos have 3
    clustered.foreach { case (l, r, sh, nl, nr) =>
      assert(nl == (if (l == 4L) 2L else 3L) &&
        nr == (if (r == 4L) 2L else 3L) &&
        sh == math.min(nl, nr), s"($l,$r,$sh,$nl,$nr)")
    }
  }

  test("videoFramesLenient: strict parity on healthy videos, one bad row per corrupt") {
    val healthy = Media.genPatternAvis(
      Seq((1L, 4L, 2)).toDF("id", "k", "n"), "id", "k", "n", w = 9, h = 8)
    // a VALID container whose single frame payload is undecodable junk —
    // exactly the case the container-level lenient decode cannot see
    val junk = Array.tabulate[Byte](16)(i => (i * 7 + 1).toByte)
    val movi = {
      val bb = java.nio.ByteBuffer.allocate(8 + 16)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("00dc".getBytes("US-ASCII")).putInt(16).put(junk)
      bb.array()
    }
    val bad = Media.encodeAvi(33333, 1, 1, 9, 8, movi)
    val badDf = Seq((2L, bad)).toDF("id", "content")
    assert(Media.decodeVideoMetaLenient(badDf, "id", "content")
      .select("decode_ok").as[Boolean].head(),
      "container-level check must NOT catch a frame-payload failure " +
        "(that's the gap videoFramesLenient exists for)")
    val all = healthy.select($"id", $"content").union(badDf)
    val got = Media.videoFramesLenient(all, "id", "content")
    // healthy rows bit-equal to the strict path
    val strict = Media.videoFrames(healthy, "id", "content")
      .select("id", "frame_idx", "width", "height", "dhash")
      .as[(Long, Int, Int, Int, Long)].collect().sortBy(_._2).toSeq
    val lenientGood = got.filter($"frame_ok")
      .select("id", "frame_idx", "width", "height", "dhash")
      .as[(Long, Int, Int, Int, Long)].collect().sortBy(_._2).toSeq
    assert(lenientGood == strict)
    // the corrupt video emits exactly ONE row: no frames, a failure class
    val badRows = got.filter(!$"frame_ok")
      .select("id", "frame_err").as[(Long, String)].collect().toSeq
    assert(badRows.map(_._1) == Seq(2L) && badRows.head._2 != null)
  }

  test("MP4 encode→parse round-trips ftyp/mvhd/tkhd/stts/stsz facts") {
    val bytes = Media.encodeMp4("isom", timescale = 90000L,
      duration = 90000L * 4, tracks = Seq((640, 480), (0, 0)),
      samples = (0 until 120).map(i => Array[Byte](i.toByte, (i + 1).toByte)),
      sampleDelta = 3000L)
    assert(Media.sniffMime(bytes) == "video/mp4")
    val m = Media.parseMp4(bytes)
    assert(m == Media.Mp4Meta("isom", 90000L, 360000L, 2, 640, 480,
      120, 120L, 120L * 3000L))
    assert(m.fpsX1000.contains(90000L * 1000L / 3000L))
    intercept[IllegalArgumentException] { Media.parseMp4("nope".getBytes) }
    // an AVI is a container but not ISO-BMFF — the sniff keeps them apart
    val avi = Media.encodeAvi(33333, 10, 1, 320, 240)
    intercept[IllegalArgumentException] { Media.parseMp4(avi) }
    // ftyp alone (no moov) is sniffable but not parseable
    val ftypOnly = java.util.Arrays.copyOfRange(bytes, 0, 20)
    intercept[IllegalArgumentException] { Media.parseMp4(ftypOnly) }
  }

  test("MP4 walk handles largesize, to-EOF boxes, and v1 mvhd times") {
    // hand-built: ftyp, then a moov whose mvhd is VERSION 1 (64-bit
    // creation/modification/duration) and whose own size uses the
    // size==1 + largesize encoding; trailing box with size==0 (to EOF)
    def box(typ: String, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
      bb.putInt(8 + payload.length).put(typ.getBytes("US-ASCII")).put(payload)
      bb.array()
    }
    val ftyp = box("ftyp", {
      val bb = java.nio.ByteBuffer.allocate(12)
      bb.put("mp42".getBytes("US-ASCII")).putInt(0)
        .put("mp42".getBytes("US-ASCII")); bb.array()
    })
    val mvhdV1 = {
      val bb = java.nio.ByteBuffer.allocate(8 + 4 + 8 + 8 + 4 + 8)
      bb.putInt(bb.capacity()).put("mvhd".getBytes("US-ASCII"))
        .putInt(0x01000000)      // version 1, flags 0
        .putLong(0L).putLong(0L) // creation, modification (64-bit)
        .putInt(600)             // timescale
        .putLong(3001L)          // duration (64-bit)
      bb.array()
    }
    val moovLarge = {
      val bb = java.nio.ByteBuffer.allocate(16 + mvhdV1.length)
      bb.putInt(1).put("moov".getBytes("US-ASCII"))
        .putLong(16L + mvhdV1.length).put(mvhdV1)
      bb.array()
    }
    val freeToEof = {
      val bb = java.nio.ByteBuffer.allocate(12)
      bb.putInt(0).put("free".getBytes("US-ASCII")).putInt(0)
      bb.array()
    }
    val bytes = ftyp ++ moovLarge ++ freeToEof
    val m = Media.parseMp4(bytes)
    assert(m.majorBrand == "mp42")
    assert(m.timescale == 600L && m.duration == 3001L)
    assert(m.nTracks == 0 && m.nSamples == 0)
    // a box whose size overruns its scope must throw, not mis-walk
    val torn = bytes.clone()
    java.nio.ByteBuffer.wrap(torn).putInt(0, 1 << 30)
    intercept[IllegalArgumentException] { Media.parseMp4(torn) }
  }

  test("mp4FramePayloads walks stsz/stsc/stco across multiple chunks") {
    // hand-built sample table: 3 variable-size samples split 2+1 over two
    // chunks (stsc runs: chunk 1 → 2 samples, chunk 2 → 1)
    def box(typ: String, payloads: Array[Byte]*): Array[Byte] = {
      val len = 8 + payloads.map(_.length).sum
      val bb = java.nio.ByteBuffer.allocate(len)
      bb.putInt(len).put(typ.getBytes("US-ASCII"))
      payloads.foreach(bb.put)
      bb.array()
    }
    def full(body: Array[Byte]): Array[Byte] = Array[Byte](0, 0, 0, 0) ++ body
    def ints(vs: Int*): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(4 * vs.length)
      vs.foreach(bb.putInt); bb.array()
    }
    val samples = Seq("AA".getBytes, "BBB".getBytes, "C".getBytes)
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII"), ints(0),
      "isom".getBytes("US-ASCII"))
    val stsz = box("stsz", full(ints(0, 3, 2, 3, 1)))
    val stsc = box("stsc", full(ints(2, 1, 2, 1, 2, 1, 1)))
    def fileOf(off1: Int, off2: Int) = ftyp ++
      box("moov", box("trak", box("mdia", box("minf",
        box("stbl", stsz, stsc, box("stco", full(ints(2, off1, off2)))))))) ++
      box("mdat", samples.flatten.toArray)
    val mdatPayload = fileOf(0, 0).length - 6 // samples are the last 6 bytes
    val bytes = fileOf(mdatPayload, mdatPayload + 5)
    assert(Media.mp4FramePayloads(bytes).map(new String(_)) ==
      Seq("AA", "BBB", "C"))
    // co64 (64-bit chunk offsets) must walk identically to stco
    def longs(vs: Long*): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 * vs.length)
      vs.foreach(bb.putLong); bb.array()
    }
    def fileOf64(off1: Long, off2: Long) = ftyp ++
      box("moov", box("trak", box("mdia", box("minf",
        box("stbl", stsz, stsc,
          box("co64", full(ints(2) ++ longs(off1, off2)))))))) ++
      box("mdat", samples.flatten.toArray)
    val mdat64 = fileOf64(0, 0).length - 6
    assert(Media.mp4FramePayloads(fileOf64(mdat64, mdat64 + 5))
      .map(new String(_)) == Seq("AA", "BBB", "C"))
  }

  test("videoFrames decodes MP4 samples to the same hashes as AVI frames") {
    val df = Seq((1L, 3L, 2), (2L, 9L, 3)).toDF("id", "k", "n")
    val mp4s = Media.genPatternMp4s(df, "id", "k", "n", w = 9, h = 8)
    val got = Media.videoFrames(mp4s, "id", "content")
      .select("id", "frame_idx", "dhash")
      .as[(Long, Int, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    val avis = Media.genPatternAvis(df, "id", "k", "n", w = 9, h = 8)
    val fromAvi = Media.videoFrames(avis, "id", "content")
      .select("id", "frame_idx", "dhash")
      .as[(Long, Int, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got == fromAvi) // container-independent frame signatures
    assert(got.map(r => (r._1, r._2)) ==
      Seq((1L, 0), (1L, 1), (2L, 0), (2L, 1), (2L, 2)))
  }

  test("MP4 track selection dispatches on hdlr 'vide', not trak position") {
    // audio-FIRST file: the soun trak carries its own (junk) sample table;
    // positional selection would decode garbage — typed selection must
    // yield frames byte-identical to the video-first twin
    val df = Seq((1L, 3L, 2), (2L, 9L, 3)).toDF("id", "k", "n")
    val avOrder = Media.genPatternMp4sAvOrder(df, "id", "k", "n", w = 9, h = 8)
    val got = Media.videoFrames(avOrder, "id", "content")
      .select("id", "frame_idx", "dhash")
      .as[(Long, Int, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    val twin = Media.videoFrames(
      Media.genPatternMp4s(df, "id", "k", "n", w = 9, h = 8), "id", "content")
      .select("id", "frame_idx", "dhash")
      .as[(Long, Int, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got == twin)
    // metadata facts too: nSamples/stts latch onto the vide trak (n
    // samples), never the soun trak (4n samples at a different delta)
    val bytes = avOrder.filter($"id" === 2L)
      .select("content").as[Array[Byte]].head()
    val m = Media.parseMp4(bytes)
    assert(m.nTracks == 2 && m.nSamples == 3 && m.sttsCount == 3L)
    assert(m.fpsX1000.contains(30000L * 1000L / 1001L))
    assert(m.width == 9 && m.height == 8)
  }

  test("parseMp4 duration-weights fps across multi-entry stts (VFR)") {
    // two stts runs: 10 samples at delta 100, 10 at delta 200 → the
    // weighted fps is 20·ts·1000/3000 — NOT the first run's ts·1000/100
    val samples = (0 until 20).map(i => Array[Byte](i.toByte))
    val bytes = Media.encodeMp4Tracks("isom", 6000L, 3000L, Seq(
      Media.Mp4Track("vide", 320, 240, samples,
        Seq((10, 100L), (10, 200L)))))
    val m = Media.parseMp4(bytes)
    assert(m.nSamples == 20 && m.sttsCount == 20L && m.sttsDur == 3000L)
    assert(m.fpsX1000.contains(20L * 6000L * 1000L / 3000L)) // 40000
    // single-run files floor to exactly the old first-delta form
    val cfr = Media.parseMp4(Media.encodeMp4("isom", 90000L, 360000L,
      Seq((640, 480)), (0 until 120).map(i => Array[Byte](i.toByte)), 3000L))
    assert(cfr.fpsX1000.contains(90000L * 1000L / 3000L))
  }

  test("mp4KeyframePayloads selects stss sync samples; absent stss = all") {
    val df = Seq((1L, 4L, 6, 2), (2L, 7L, 5, 3)).toDF("id", "k", "n", "step")
    val media = Media.genPatternMp4sKeyframed(df, "id", "k", "n", "step",
      w = 9, h = 8)
    val kf = Media.mp4Keyframes(media, "id", "content")
      .select("id", "frame_idx", "dhash")
      .as[(Long, Int, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    // keyframe rows are exactly the f % step == 0 subset of the full walk
    val full = Media.videoFrames(media, "id", "content")
      .select("id", "frame_idx", "dhash")
      .as[(Long, Int, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    val steps = Map(1L -> 2, 2L -> 3)
    assert(kf == full.filter(r => r._2 % steps(r._1) == 0))
    assert(kf.map(r => (r._1, r._2)) ==
      Seq((1L, 0), (1L, 2), (1L, 4), (2L, 0), (2L, 3)))
    // no stss box → every sample is sync (ISO 14496-12 §8.6.2)
    val plain = Media.genPatternMp4s(Seq((5L, 2L, 3)).toDF("id", "k", "n"),
      "id", "k", "n", w = 9, h = 8)
    val all = Media.mp4Keyframes(plain, "id", "content")
      .select("frame_idx").as[Int].collect().sorted.toSeq
    assert(all == Seq(0, 1, 2))
    // an out-of-range sync sample number throws rather than mis-indexing
    val bad = Media.encodeMp4Tracks("isom", 30000L, 1001L, Seq(
      Media.Mp4Track("vide", 9, 8, Seq(Array[Byte](1, 2)),
        Seq((1, 1001L)), syncSamples = Seq(9))))
    intercept[IllegalArgumentException] { Media.mp4KeyframePayloads(bad) }
  }

  test("decodeVideoMetaLenient dispatches AVI and MP4, quarantines the rest") {
    val avi = Media.genAvis(
      Seq((1L, 33333, 300, 320, 240)).toDF("id", "uspf", "frames", "w", "h"),
      "id", "uspf", "frames", "w", "h").select("content").as[Array[Byte]].head()
    val mp4 = Media.encodeMp4("isom", 30000L, 1001L * 60, Seq((640, 360)),
      (0 until 60).map(i => Array[Byte](i.toByte)), 1001L)
    val df = Seq((1L, avi), (2L, mp4), (3L, "junk".getBytes))
      .toDF("id", "content")
    val out = Media.decodeVideoMetaLenient(df, "id", "content")
      .select("id", "decode_ok", "mime", "width", "height", "n_frames",
        "n_streams", "fps_x1000", "duration_ms")
      .as[(Long, Boolean, String, Option[Int], Option[Int], Option[Int],
        Option[Int], Option[Long], Option[Long])]
      .collect().sortBy(_._1).toSeq
    assert(out(0) == ((1L, true, "video/avi", Some(320), Some(240), Some(300),
      Some(1), Some(30000L), Some(9999L))))
    // mp4: fps_x1000 = 30000·1000/1001 = 29970; duration = 60060·1000/30000
    assert(out(1) == ((2L, true, "video/mp4", Some(640), Some(360), Some(60),
      Some(1), Some(29970L), Some(2002L))))
    assert(!out(2)._2 && out(2)._3 == "application/octet-stream")
  }

  test("videoFramesLenient quarantines a torn MP4 with its failure class") {
    val good = Media.genPatternMp4s(Seq((1L, 4L, 2)).toDF("id", "k", "n"),
      "id", "k", "n", 9, 8).select("content").as[Array[Byte]].head()
    val torn = java.util.Arrays.copyOfRange(good, 0, good.length - 10)
    val out = Media.videoFramesLenient(
      Seq((1L, good), (2L, torn)).toDF("id", "content"), "id", "content")
      .select("id", "frame_ok", "frame_err")
      .as[(Long, Boolean, Option[String])].collect().sortBy(_._1).toSeq
    assert(out.filter(_._1 == 1L).forall(_._2))
    assert(out.count(_._1 == 1L) == 2)
    val bad = out.filter(_._1 == 2L)
    assert(bad.length == 1 && !bad.head._2 && bad.head._3.nonEmpty)
  }

  test("noise fixtures: unique signatures at scale, containers agree, perturb flips bit 0") {
    // the PATTERN fixtures fold to a ≤256-value hash space (oracle
    // design); the noise generators must NOT — 200 seeds → 600 distinct
    // frame hashes / 200 distinct fingerprints
    val vids = spark.range(200).select($"id".as("mid"), $"id".as("k"))
      .withColumn("n", lit(3)).withColumn("mp4", $"mid" % 2 === 0)
    val frames = Media.videoFrames(
      Media.genNoiseVideos(vids, "mid", "k", "n", "mp4", 9, 8),
      "mid", "content")
    assert(frames.count() == 600)
    assert(frames.select("dhash").distinct().count() == 600)
    // same seed → byte-identical frames in either container
    val both = spark.range(2).select(lit(7L).as("k"), $"id".as("mid"))
      .withColumn("n", lit(2)).withColumn("mp4", $"mid" === 0)
    val hs = Media.videoFrames(
      Media.genNoiseVideos(both, "mid", "k", "n", "mp4", 9, 8),
      "mid", "content")
      .select("mid", "frame_idx", "dhash")
      .as[(Long, Int, Long)].collect().groupBy(_._1)
    assert(hs(0L).sortBy(_._2).map(_._3).toSeq ==
      hs(1L).sortBy(_._2).map(_._3).toSeq)
    val wavs = spark.range(200).select($"id".as("mid"), $"id".as("k"))
      .withColumn("p", lit(0)).withColumn("nw", lit(65))
    val fps = Media.audioFingerprint(
      Media.genNoiseWavs(wavs, "mid", "k", "p", "nw"), "mid", "content")
    assert(fps.select("afp").distinct().count() == 200)
    // the modeled re-encode still flips exactly fingerprint bit 0
    val pair = Seq((0L, 9L, 0, 65), (1L, 9L, 1, 65)).toDF("mid", "k", "p", "nw")
    val two = Media.audioFingerprint(
      Media.genNoiseWavs(pair, "mid", "k", "p", "nw"), "mid", "content")
      .select("mid", "afp").as[(Long, Long)].collect().sortBy(_._1)
    assert((two(0)._2 ^ two(1)._2) == 1L)
  }

  test("stripImageMeta removes EXIF from PNG and JPEG, pixels untouched") {
    // PNG: eXIf orientation tag drops, decode then sees the RAW grid
    val raw = Media.encodeGrayPng(pattern(6L, 0, 9, 8), 9, 8)
    val tagged = Media.pngWithOrientation(raw, 6)
    assert(Media.exifOrientation(tagged) == 6)
    val scrubbed = Media.stripImageMeta(tagged)
    assert(scrubbed.length < tagged.length)
    assert(Media.sniffMime(scrubbed) == "image/png")
    assert(Media.exifOrientation(scrubbed) == 1) // absent → default
    val (w, h, _, px) = Media.decodeLuma(scrubbed)
    assert((w, h) == ((9, 8)) && px.sameElements(pattern(6L, 0, 9, 8)))
    // the TAGGED original decodes rotated (6 = 90° CW: dims swap) — the
    // scrub genuinely changed observable behavior, not just bytes
    val (tw, th, _, _) = Media.decodeLuma(tagged)
    assert((tw, th) == ((8, 9)))
    // JPEG: APP1 Exif drops, entropy data copied verbatim (same pixels)
    val jpegRaw = {
      val img = new java.awt.image.BufferedImage(9, 8,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      (0 until 8).foreach(y => (0 until 9).foreach(x =>
        img.getRaster.setSample(x, y, 0, pattern(6L, 0, 9, 8)(y * 9 + x))))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos); bos.toByteArray
    }
    val jTagged = Media.jpegWithOrientation(jpegRaw, 3)
    assert(Media.exifOrientation(jTagged) == 3)
    val jScrubbed = Media.stripImageMeta(jTagged)
    assert(Media.sniffMime(jScrubbed) == "image/jpeg")
    assert(Media.exifOrientation(jScrubbed) == 1)
    val (jw, jh, _, jp) = Media.decodeLuma(jScrubbed)
    val (ow, oh, _, op) = Media.decodeLuma(jpegRaw)
    assert((jw, jh) == ((ow, oh)) && jp.sameElements(op))
    // frame op reports the removed byte count
    val out = Media.stripImageMetadata(
      Seq((1L, tagged), (2L, jTagged)).toDF("id", "content"), "id", "content")
      .select("id", "bytes_removed").as[(Long, Int)].collect().sortBy(_._1)
    assert(out.forall(_._2 > 0))
    intercept[IllegalArgumentException] {
      Media.stripImageMeta("not an image".getBytes)
    }
  }

  test("JPEG scrub keeps APP14/ICC APP2, drops MPF APP2, cuts post-EOI trailer") {
    val jpegRaw = {
      val img = new java.awt.image.BufferedImage(9, 8,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      (0 until 8).foreach(y => (0 until 9).foreach(x =>
        img.getRaster.setSample(x, y, 0, pattern(3L, 0, 9, 8)(y * 9 + x))))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos); bos.toByteArray
    }
    def seg(marker: Int, payload: Array[Byte]): Array[Byte] =
      Array(0xff.toByte, marker.toByte,
        ((payload.length + 2) >> 8).toByte, ((payload.length + 2) & 0xff).toByte
      ) ++ payload
    // APP14 Adobe (color transform — decode-critical), an ICC APP2, and a
    // non-ICC APP2 (MPF carries embedded previews — a PII channel)
    val app14 = seg(0xee, "Adobe".getBytes("US-ASCII") ++
      Array[Byte](0, 100, 0, 0, 0, 0, 1))
    val icc = seg(0xe2, "ICC_PROFILE".getBytes("US-ASCII") ++
      Array[Byte](0, 1, 1) ++ Array.fill[Byte](8)(0x42))
    val mpf = seg(0xe2, "MPFSECRET".getBytes("US-ASCII") ++
      Array.fill[Byte](8)(0x24))
    // a NON-Adobe APP14: the keep is identifier-gated exactly like the
    // ICC APP2 keep -- an arbitrary vendor APP14 is a PII channel
    val xapp14 = seg(0xee, "XAPP14-PII-CHANNEL".getBytes("US-ASCII"))
    val trailer = "TRAILER-PII-PREVIEW".getBytes("US-ASCII")
    val tagged = jpegRaw.take(2) ++ app14 ++ xapp14 ++ icc ++ mpf ++
      jpegRaw.drop(2) ++ trailer
    val scrubbed = Media.stripImageMeta(tagged)
    val s = new String(scrubbed, "ISO-8859-1")
    assert(s.contains("Adobe")) // Adobe APP14 survives
    assert(!s.contains("XAPP14-PII")) // non-Adobe APP14 drops
    assert(s.contains("ICC_PROFILE")) // ICC APP2 survives
    assert(!s.contains("MPFSECRET")) // non-ICC APP2 drops
    assert(!s.contains("TRAILER-PII")) // post-EOI trailer is cut…
    assert((scrubbed(scrubbed.length - 2) & 0xff) == 0xff &&
      (scrubbed(scrubbed.length - 1) & 0xff) == 0xd9) // …output ends at EOI
    // pixels bit-identical to the untagged original
    val (sw, sh, _, sp) = Media.decodeLuma(scrubbed)
    val (ow, oh, _, op) = Media.decodeLuma(jpegRaw)
    assert((sw, sh) == ((ow, oh)) && sp.sameElements(op))
    // a trailer that itself contains FF D9 (an appended preview JPEG, the
    // real-world case) is still fully removed: the scan stops at the
    // FIRST structural EOI, not the last byte match
    val taggedJpegTrailer = jpegRaw ++ jpegRaw // second JPEG = the trailer
    val cut = Media.stripImageMeta(taggedJpegTrailer)
    assert(cut.length <= jpegRaw.length)
    assert(Media.decodeLuma(cut)._4.sameElements(op))
  }

  test("fragmented MP4 (moof/tfhd/trun) parses meta and extracts frames") {
    // 7 samples over fragments of 3: the moov carries NO sample table —
    // facts and layout must come from the trex defaults + trun walk
    val samples = (0 until 7).map(i => Array[Byte](i.toByte, (i * 3).toByte, 7))
    val bytes = Media.encodeFmp4("isom", 30000L, 1001L, 320, 240,
      samples.grouped(3).toSeq)
    assert(Media.sniffMime(bytes) == "video/mp4")
    val m = Media.parseMp4(bytes)
    assert(m.nTracks == 1 && m.width == 320 && m.height == 240)
    assert(m.nSamples == 7 && m.sttsCount == 7L && m.sttsDur == 7L * 1001L)
    assert(m.fpsX1000.contains(30000L * 1000L / 1001L))
    assert(m.duration == 7L * 1001L) // mvhd carries the total
    // frame payloads byte-identical, in file order, across fragments
    assert(Media.mp4FramePayloads(bytes).map(_.toSeq) == samples.map(_.toSeq))
    // fragment-start samples play the stss role: fragments of 3 → 0, 3, 6
    assert(Media.mp4KeyframePayloads(bytes).map(_._1) == Seq(0, 3, 6))
    // the frame-dedup tier sees identical hashes for fMP4 and plain MP4
    val df = Seq((1L, 5L, 4)).toDF("id", "k", "n")
    val frag = Media.videoFrames(
      Media.genPatternFmp4s(df.withColumn("fs", lit(2)), "id", "k", "n", "fs", 9, 8),
      "id", "content").select("frame_idx", "dhash")
      .as[(Int, Long)].collect().sortBy(_._1).toSeq
    val plain = Media.videoFrames(
      Media.genPatternMp4s(df, "id", "k", "n", 9, 8),
      "id", "content").select("frame_idx", "dhash")
      .as[(Int, Long)].collect().sortBy(_._1).toSeq
    assert(frag == plain && frag.size == 4)
    // a torn fragment (sample range past EOF) throws, not mis-walks
    val torn = java.util.Arrays.copyOfRange(bytes, 0, bytes.length - 4)
    intercept[Exception] { Media.mp4FramePayloads(torn) }
  }

  test("fMP4 walk: explicit base_data_offset, multiple truns, default sizes") {
    // one traf carrying TWO truns: the first with explicit data_offset +
    // per-sample sizes, the second with NEITHER — offsets must continue
    // from the first run's cursor and sizes fall back to the tfhd
    // default_sample_size; the base comes from an explicit
    // base_data_offset (flag 0x1), not the moof position
    def box(typ: String, payloads: Array[Byte]*): Array[Byte] = {
      val len = 8 + payloads.map(_.length).sum
      val bb = java.nio.ByteBuffer.allocate(len)
      bb.putInt(len).put(typ.getBytes("US-ASCII"))
      payloads.foreach(bb.put)
      bb.array()
    }
    def full(vf: Int, body: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(4 + body.length)
      bb.putInt(vf).put(body)
      bb.array()
    }
    def ints(vs: Int*): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(4 * vs.length)
      vs.foreach(bb.putInt); bb.array()
    }
    val head = Media.encodeFmp4("isom", 30000L, 1001L, 9, 8, Nil)
    val mfhd = box("mfhd", full(0, ints(1)))
    def moofOf(base: Long): Array[Byte] = {
      val tfhd = box("tfhd", full(0x11, { // base_data_offset + default size
        val bb = java.nio.ByteBuffer.allocate(4 + 8 + 4)
        bb.putInt(1).putLong(base).putInt(1); bb.array()
      }))
      val trun1 = box("trun", full(0x201, ints(2, 0, 2, 3))) // off 0, sz 2,3
      val trun2 = box("trun", full(0x0, ints(2))) // continues, default sz 1
      box("moof", mfhd, box("traf", tfhd, trun1, trun2))
    }
    val moofLen = moofOf(0L).length
    val base = head.length + moofLen + 8
    val bytes = head ++ moofOf(base.toLong) ++
      box("mdat", "AABBBCD".getBytes("US-ASCII"))
    assert(Media.mp4FramePayloads(bytes).map(new String(_)) ==
      Seq("AA", "BBB", "C", "D"))
    // one traf = one fragment = one sync point, at its FIRST sample
    assert(Media.mp4KeyframePayloads(bytes).map { case (i, p) =>
      (i, new String(p)) } == Seq((0, "AA")))
    val m = Media.parseMp4(bytes)
    assert(m.nSamples == 4 && m.sttsDur == 4 * 1001L)
  }

  test("mp4Scenes ranks sync samples into a scene table, fMP4 included") {
    val media = Media.genPatternMp4sKeyframed(
      Seq((1L, 4L, 7, 3)).toDF("id", "k", "n", "step"),
      "id", "k", "n", "step", 9, 8)
    val got = Media.mp4Scenes(media, "id", "content")
      .select("scene_idx", "start_frame_idx", "dhash")
      .as[(Int, Int, Long)].collect().sortBy(_._1).toSeq
    // sync samples f = 0, 3, 6 → scenes 0, 1, 2; hashes = the keyframe walk's
    val kf = Media.mp4Keyframes(media, "id", "content")
      .select("frame_idx", "dhash").as[(Int, Long)].collect().sortBy(_._1)
    assert(got.map(r => (r._1, r._2)) == Seq((0, 0), (1, 3), (2, 6)))
    assert(got.map(r => (r._2, r._3)) == kf.toSeq)
    // fragmented file: fragment starts rank the same way
    val frag = Media.genPatternFmp4s(
      Seq((2L, 4L, 7, 3)).toDF("id", "k", "n", "fs"),
      "id", "k", "n", "fs", 9, 8)
    val fromFrag = Media.mp4Scenes(frag, "id", "content")
      .select("scene_idx", "start_frame_idx", "dhash")
      .as[(Int, Int, Long)].collect().sortBy(_._1).toSeq
    assert(fromFrag == got) // same content, same scene table, either layout
  }

  test("fMP4 with audio traf FIRST in every moof extracts the vide track") {
    // two-track fragmented file, audio trak + traf declared first — the
    // fragment-tier edition of the positional-selection trap: the walk
    // must bind to the 'vide' track's track_ID and skip the audio trafs
    def box(typ: String, payloads: Array[Byte]*): Array[Byte] = {
      val len = 8 + payloads.map(_.length).sum
      val bb = java.nio.ByteBuffer.allocate(len)
      bb.putInt(len).put(typ.getBytes("US-ASCII"))
      payloads.foreach(bb.put)
      bb.array()
    }
    def full(vf: Int, body: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(4 + body.length)
      bb.putInt(vf).put(body)
      bb.array()
    }
    def ints(vs: Int*): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(4 * vs.length)
      vs.foreach(bb.putInt); bb.array()
    }
    // moov: audio trak (id 1) first, video trak (id 2) second, both
    // handler-typed, no sample tables; trex for both tracks
    val init = Media.encodeMp4Tracks("isom", 30000L, 4 * 1001L, Seq(
      Media.Mp4Track("soun", 0, 0),
      Media.Mp4Track("vide", 9, 8)))
    val bbInit = java.nio.ByteBuffer.wrap(init)
    var moovStart = -1
    var off = 0
    while (off + 8 <= init.length) {
      if (new String(init, off + 4, 4, "US-ASCII") == "moov") moovStart = off
      off += bbInit.getInt(off)
    }
    def trex(tid: Int, dur: Int) = box("trex", full(0, ints(tid, 1, dur, 0, 0)))
    val mvex = box("mvex", trex(1, 250), trex(2, 1001))
    val moovLen = bbInit.getInt(moovStart)
    val moov = {
      val body = java.util.Arrays.copyOfRange(init, moovStart + 8,
        moovStart + moovLen) ++ mvex
      val bb = java.nio.ByteBuffer.allocate(8 + body.length)
      bb.putInt(8 + body.length).put("moov".getBytes("US-ASCII")).put(body)
      bb.array()
    }
    val head = java.util.Arrays.copyOfRange(init, 0, moovStart) ++ moov
    // one moof with TWO trafs, audio first: audio samples "xxxx" (junk),
    // video samples "AA","BB"; one mdat holding audio then video bytes
    val audio = "xyzw".getBytes("US-ASCII") // 4 × 1-byte samples
    val video = Seq("AA", "BB").map(_.getBytes("US-ASCII"))
    def moofOf(dataBase: Int): Array[Byte] = {
      val mfhd = box("mfhd", full(0, ints(1)))
      // audio traf: default-base-is-moof, trun with data_offset, 4 × 1B
      val trafA = box("traf",
        box("tfhd", full(0x020010, ints(1, 1))), // default_sample_size 1
        box("trun", full(0x1, ints(4, dataBase))))
      // video traf: data_offset past the audio bytes, per-sample sizes
      val trafV = box("traf",
        box("tfhd", full(0x020000, ints(2))),
        box("trun", full(0x201, ints(2, dataBase + 4, 2, 2))))
      box("moof", mfhd, trafA, trafV)
    }
    val moofLen = moofOf(0).length
    val bytes = head ++ moofOf(moofLen + 8) ++
      box("mdat", audio, video(0), video(1))
    assert(Media.mp4FramePayloads(bytes).map(new String(_)) == Seq("AA", "BB"))
    assert(Media.mp4KeyframePayloads(bytes).map { case (i, p) =>
      (i, new String(p)) } == Seq((0, "AA")))
    val m = Media.parseMp4(bytes)
    // facts from the vide track only: 2 samples at delta 1001, never the
    // audio track's 4 at 250
    assert(m.nSamples == 2 && m.sttsDur == 2 * 1001L)
    assert(m.nTracks == 2 && m.width == 9 && m.height == 8)
  }

  test("hybrid MP4: populated audio stbl + table-less vide trak routes to moof") {
    // the trap: moov stores the AUDIO track's full sample table while the
    // video track is fragmented (empty stbl, samples in moof) -- the
    // first-sample-table fallback would select the audio table and report
    // audio facts as video fps / extract audio samples as frames. With
    // moof present, the table-less 'vide' trak must win and route to the
    // fragment walk.
    def box(typ: String, payloads: Array[Byte]*): Array[Byte] = {
      val len = 8 + payloads.map(_.length).sum
      val bb = java.nio.ByteBuffer.allocate(len)
      bb.putInt(len).put(typ.getBytes("US-ASCII"))
      payloads.foreach(bb.put)
      bb.array()
    }
    def full(vf: Int, body: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(4 + body.length)
      bb.putInt(vf).put(body)
      bb.array()
    }
    def ints(vs: Int*): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(4 * vs.length)
      vs.foreach(bb.putInt); bb.array()
    }
    // moov: audio trak (id 1) WITH a 4-sample table at delta 250, video
    // trak (id 2) with NO sample table; trex default duration for track 2
    val audioSamples = "wxyz".getBytes("US-ASCII").map(Array(_)).toSeq
    val init = Media.encodeMp4Tracks("isom", 30000L, 2 * 1001L, Seq(
      Media.Mp4Track("soun", 0, 0, audioSamples, Seq((4, 250L))),
      Media.Mp4Track("vide", 9, 8)))
    val bbInit = java.nio.ByteBuffer.wrap(init)
    var moovStart = -1
    var off = 0
    while (off + 8 <= init.length) {
      if (new String(init, off + 4, 4, "US-ASCII") == "moov") moovStart = off
      off += bbInit.getInt(off)
    }
    val mvex = box("mvex", box("trex", full(0, ints(2, 1, 1001, 0, 0))))
    val moovLen = bbInit.getInt(moovStart)
    val moov = {
      val body = java.util.Arrays.copyOfRange(init, moovStart + 8,
        moovStart + moovLen) ++ mvex
      val bb = java.nio.ByteBuffer.allocate(8 + body.length)
      bb.putInt(8 + body.length).put("moov".getBytes("US-ASCII")).put(body)
      bb.array()
    }
    // keep the original mdat (the audio chunk; its stco is stale after the
    // mvex splice, but nothing on the video path may ever read it)
    val head = java.util.Arrays.copyOfRange(init, 0, moovStart) ++ moov ++
      java.util.Arrays.copyOfRange(init, moovStart + moovLen, init.length)
    val video = Seq("AA", "BB").map(_.getBytes("US-ASCII"))
    def moofOf(dataOff: Int): Array[Byte] = box("moof",
      box("mfhd", full(0, ints(1))),
      box("traf",
        box("tfhd", full(0x020000, ints(2))),
        box("trun", full(0x201, ints(2, dataOff, 2, 2)))))
    val moofLen = moofOf(0).length
    val bytes = head ++ moofOf(moofLen + 8) ++ box("mdat", video: _*)
    assert(Media.mp4FramePayloads(bytes).map(new String(_)) == Seq("AA", "BB"))
    assert(Media.mp4KeyframePayloads(bytes).map { case (i, p) =>
      (i, new String(p)) } == Seq((0, "AA")))
    val m = Media.parseMp4(bytes)
    // fragment facts (2 samples at the trex delta), NEVER the audio
    // table's 4 samples at 250
    assert(m.nSamples == 2 && m.sttsDur == 2 * 1001L)
    assert(m.nTracks == 2 && m.width == 9 && m.height == 8)
    // WITHOUT moof boxes the pre-hdlr first-table fallback still applies
    // (a table-less vide trak alone cannot mean fragmented)
    val noFrag = java.util.Arrays.copyOfRange(head, 0, head.length)
    val m2 = Media.parseMp4(noFrag)
    assert(m2.nSamples == 4 && m2.sttsDur == 4 * 250L)
  }

  test("fMP4 legacy multi-traf moof: default base = end of preceding traf data") {
    // ISO 14496-12 s8.8.7: with NEITHER base-data-offset-present (0x1)
    // NOR default-base-is-moof (0x020000), the first traf's base defaults
    // to the moof start and every SUBSEQUENT traf's to the end of the
    // preceding traf's data. A moof-start default for the second traf
    // (the old behavior) reads the audio bytes as video frames.
    def box(typ: String, payloads: Array[Byte]*): Array[Byte] = {
      val len = 8 + payloads.map(_.length).sum
      val bb = java.nio.ByteBuffer.allocate(len)
      bb.putInt(len).put(typ.getBytes("US-ASCII"))
      payloads.foreach(bb.put)
      bb.array()
    }
    def full(vf: Int, body: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(4 + body.length)
      bb.putInt(vf).put(body)
      bb.array()
    }
    def ints(vs: Int*): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(4 * vs.length)
      vs.foreach(bb.putInt); bb.array()
    }
    // moov: audio trak id 1 + video trak id 2, both table-less; trex both
    val init = Media.encodeMp4Tracks("isom", 30000L, 2 * 1001L, Seq(
      Media.Mp4Track("soun", 0, 0),
      Media.Mp4Track("vide", 9, 8)))
    val bbInit = java.nio.ByteBuffer.wrap(init)
    var moovStart = -1
    var off = 0
    while (off + 8 <= init.length) {
      if (new String(init, off + 4, 4, "US-ASCII") == "moov") moovStart = off
      off += bbInit.getInt(off)
    }
    def trexBox(tid: Int, dur: Int) =
      box("trex", full(0, ints(tid, 1, dur, 0, 0)))
    val mvex = box("mvex", trexBox(1, 250), trexBox(2, 1001))
    val moovLen = bbInit.getInt(moovStart)
    val moov = {
      val body = java.util.Arrays.copyOfRange(init, moovStart + 8,
        moovStart + moovLen) ++ mvex
      val bb = java.nio.ByteBuffer.allocate(8 + body.length)
      bb.putInt(8 + body.length).put("moov".getBytes("US-ASCII")).put(body)
      bb.array()
    }
    val head = java.util.Arrays.copyOfRange(init, 0, moovStart) ++ moov
    // one moof, two trafs, NO base flags anywhere:
    //   traf A (audio, track 1): trun data_offset points past moof+mdat
    //     header, 4 x 1-byte samples (tfhd default_sample_size 1)
    //   traf V (video, track 2): NO data_offset -- base must default to
    //     the end of traf A's data, NOT the moof start
    val audio = "wxyz".getBytes("US-ASCII")
    val video = Seq("AA", "BB").map(_.getBytes("US-ASCII"))
    def moofOf(dataOff: Int): Array[Byte] = box("moof",
      box("mfhd", full(0, ints(1))),
      box("traf",
        box("tfhd", full(0x10, ints(1, 1))), // default_sample_size 1 only
        box("trun", full(0x1, ints(4, dataOff)))),
      box("traf",
        box("tfhd", full(0x0, ints(2))), // no optional fields at all
        box("trun", full(0x200, ints(2, 2, 2))))) // sizes only, no offset
    val moofLen = moofOf(0).length
    val bytes = head ++ moofOf(moofLen + 8) ++
      box("mdat", audio, video(0), video(1))
    assert(Media.mp4FramePayloads(bytes).map(new String(_)) == Seq("AA", "BB"))
    assert(Media.mp4KeyframePayloads(bytes).map { case (i, p) =>
      (i, new String(p)) } == Seq((0, "AA")))
    val m = Media.parseMp4(bytes)
    assert(m.nSamples == 2 && m.sttsDur == 2 * 1001L) // trex fallback durs
  }

  test("keyframe path maxFrames: degenerate no-stss / all-intra shapes are capped") {
    // the keyframe walk is cheap ONLY when stss is sparse: an absent stss
    // (every sample sync per s8.6.2) or an all-intra stss listing every
    // sample degrades it to the full frame walk -- maxFrames bounds the
    // KEYFRAME count so those shapes fail (strict) or quarantine
    // (lenient) instead of decoding unbounded inside one task
    val sparse = Media.genPatternMp4sKeyframed(  // 8 frames, stss 1,4,7
      Seq((1L, 2L, 8, 3)).toDF("id", "k", "n", "step"),
      "id", "k", "n", "step", 9, 8)
    val noStss = Media.genPatternMp4s(           // 6 frames, NO stss box
      Seq((2L, 9L, 6)).toDF("id", "k", "n"), "id", "k", "n", 9, 8)
    val allIntra = Media.genPatternMp4sKeyframed( // 6 frames, stss = ALL
      Seq((3L, 4L, 6, 1)).toDF("id", "k", "n", "step"),
      "id", "k", "n", "step", 9, 8)
    // sparse stss: 3 keyframes, sails under cap 4 on both ops
    assert(Media.mp4Keyframes(sparse, "id", "content", maxFrames = 4)
      .count() == 3)
    assert(Media.mp4Scenes(sparse, "id", "content", maxFrames = 4)
      .count() == 3)
    // degenerate shapes: 6 "keyframes" each > cap 4 -- strict throws
    for (bad <- Seq(noStss, allIntra)) {
      val e = intercept[org.apache.spark.SparkException] {
        Media.mp4Keyframes(bad, "id", "content", maxFrames = 4).collect()
      }
      assert(String.valueOf(e.getCause).contains("maxFrames"))
      intercept[org.apache.spark.SparkException] {
        Media.mp4Scenes(bad, "id", "content", maxFrames = 4).collect()
      }
    }
    // lenient twins: ONE quarantine row per over-cap video, good rows
    // bit-equal to the strict walk
    val mixed = sparse.unionByName(noStss).unionByName(allIntra)
    val kf = Media.mp4KeyframesLenient(mixed, "id", "content", maxFrames = 4)
    assert(kf.filter($"frame_ok").count() == 3)
    assert(kf.filter(!$"frame_ok").select("id", "frame_err")
      .as[(Long, String)].collect().toSet ==
      Set((2L, "IllegalArgumentException"), (3L, "IllegalArgumentException")))
    val strictRows = Media.mp4Keyframes(sparse, "id", "content")
      .select("frame_idx", "dhash").as[(Int, Long)].collect().sorted.toSeq
    val lenientRows = kf.filter($"frame_ok")
      .select("frame_idx", "dhash").as[(Int, Long)].collect().sorted.toSeq
    assert(strictRows == lenientRows)
    val sc = Media.mp4ScenesLenient(mixed, "id", "content", maxFrames = 4)
    assert(sc.filter($"frame_ok").select("scene_idx", "start_frame_idx")
      .as[(Int, Int)].collect().sorted.toSeq == Seq((0, 0), (1, 3), (2, 6)))
    assert(sc.filter(!$"frame_ok").count() == 2)
    // uncapped default: every shape still decodes in full
    assert(Media.mp4Keyframes(mixed, "id", "content").count() == 3 + 6 + 6)
  }

  test("edts/elst edit-list fact: has_edit_list surfaces, walk unperturbed") {
    val withElst = Media.encodeMp4Tracks("isom", 30000L, 4 * 1001L, Seq(
      Media.Mp4Track("vide", 9, 8,
        (0 until 4).map(i => Array[Byte](i.toByte, (i * 3).toByte)),
        Seq((4, 1001L)), editList = Seq((3 * 1001L, 1001L)))))
    val without = Media.encodeMp4Tracks("isom", 30000L, 4 * 1001L, Seq(
      Media.Mp4Track("vide", 9, 8,
        (0 until 4).map(i => Array[Byte](i.toByte, (i * 3).toByte)),
        Seq((4, 1001L)))))
    val m1 = Media.parseMp4(withElst)
    val m2 = Media.parseMp4(without)
    assert(m1.hasEditList && !m2.hasEditList)
    // the elst box must not perturb any other box-walk fact, and the
    // frame tier still reads the same sample bytes (decode order --
    // edit-list offsets are surfaced, never applied)
    assert(m1.copy(hasEditList = false) == m2)
    assert(Media.mp4FramePayloads(withElst).map(_.toSeq) ==
      Media.mp4FramePayloads(without).map(_.toSeq))
    // an elst with ZERO entries does not count as an edit list
    val emptyElst = Media.encodeMp4Tracks("isom", 30000L, 4 * 1001L, Seq(
      Media.Mp4Track("vide", 9, 8,
        (0 until 4).map(i => Array[Byte](i.toByte, (i * 3).toByte)),
        Seq((4, 1001L)), editList = Nil)))
    assert(!Media.parseMp4(emptyElst).hasEditList)
    // decodeMp4Meta surfaces the flag as a column
    val df = Seq((1L, withElst), (2L, without)).toDF("id", "content")
    assert(Media.decodeMp4Meta(df, "id", "content")
      .select("id", "has_edit_list").as[(Long, Boolean)].collect().toSet ==
      Set((1L, true), (2L, false)))
  }

  test("ctts composition-offset fact: has_comp_offsets, stbl and trun sources") {
    // moov-stored table: ctts in the video trak's stbl
    val samples = (0 until 4).map(i => Array[Byte](i.toByte, (i * 3).toByte))
    val withCtts = Media.encodeMp4Tracks("isom", 30000L, 4 * 1001L, Seq(
      Media.Mp4Track("vide", 9, 8, samples, Seq((4, 1001L)),
        cttsRuns = Seq((4, 1001)))))
    val without = Media.encodeMp4Tracks("isom", 30000L, 4 * 1001L, Seq(
      Media.Mp4Track("vide", 9, 8, samples, Seq((4, 1001L)))))
    val m1 = Media.parseMp4(withCtts)
    val m2 = Media.parseMp4(without)
    assert(m1.hasCompOffsets && !m2.hasCompOffsets)
    // the ctts box perturbs no other walk fact, and the frame tier reads
    // identical sample bytes (offsets surfaced, never applied)
    assert(m1.copy(hasCompOffsets = false) == m2)
    assert(Media.mp4FramePayloads(withCtts).map(_.toSeq) ==
      Media.mp4FramePayloads(without).map(_.toSeq))
    // fragmented sources: the encoder's plain fMP4 (no 0x800 flag)
    // reports false; a hand-built trun WITH flag 0x800 (per-sample cts
    // offsets) reports true -- and its cts words must not derail the
    // sample walk
    val frag = Media.encodeFmp4("isom", 30000L, 1001L, 9, 8,
      samples.grouped(2).toSeq)
    assert(!Media.parseMp4(frag).hasCompOffsets)
    def box(typ: String, payloads: Array[Byte]*): Array[Byte] = {
      val len = 8 + payloads.map(_.length).sum
      val bb = java.nio.ByteBuffer.allocate(len)
      bb.putInt(len).put(typ.getBytes("US-ASCII"))
      payloads.foreach(bb.put)
      bb.array()
    }
    def full(vf: Int, body: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(4 + body.length)
      bb.putInt(vf).put(body)
      bb.array()
    }
    def ints(vs: Int*): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(4 * vs.length)
      vs.foreach(bb.putInt); bb.array()
    }
    val head = Media.encodeFmp4("isom", 30000L, 1001L, 9, 8, Nil)
    def moofOf(dataOff: Int): Array[Byte] = box("moof",
      box("mfhd", full(0, ints(1))),
      box("traf",
        box("tfhd", full(0x020000, ints(1))),
        // flags 0xA01: data_offset + per-sample size + per-sample cts
        box("trun", full(0xA01, ints(2, dataOff, 2, 1001, 2, 2002)))))
    val moofLen = moofOf(0).length
    val ctsFrag = head ++ moofOf(moofLen + 8) ++
      box("mdat", "AABB".getBytes("US-ASCII"))
    assert(Media.parseMp4(ctsFrag).hasCompOffsets)
    assert(Media.mp4FramePayloads(ctsFrag).map(new String(_)) ==
      Seq("AA", "BB"))
    // decodeMp4Meta surfaces the column
    val df = Seq((1L, withCtts), (2L, without)).toDF("id", "content")
    assert(Media.decodeMp4Meta(df, "id", "content")
      .select("id", "has_comp_offsets").as[(Long, Boolean)].collect().toSet ==
      Set((1L, true), (2L, false)))
  }

  test("self-initializing DASH media segment: styp/sidx walk, no moov anywhere") {
    // the CDN-served shape between init refreshes: styp sidx moof mdat --
    // parseMp4 previously required moov/mvhd; now timescale/duration/
    // track binding come from sidx and sample facts from the
    // explicit-field trun walk
    val samples = (0 until 7).map(i => Array[Byte](i.toByte, (i * 3).toByte))
    val seg = Media.encodeMediaSegment("msdh", 30000L, 1001L,
      samples.grouped(3).toSeq)
    assert(Media.sniffMime(seg) == "video/mp4")
    val m = Media.parseMp4(seg)
    assert(m.majorBrand == "msdh" && m.timescale == 30000L)
    assert(m.duration == 7 * 1001L) // summed sidx subsegment durations
    assert(m.nTracks == 1 && m.width == 0 && m.height == 0)
    assert(m.nSamples == 7 && m.sttsDur == 7 * 1001L)
    // frame walk: byte-identical payloads through the sidx-bound layout
    assert(Media.mp4FramePayloads(seg).map(_.toSeq) == samples.map(_.toSeq))
    // fragment starts are the sync points: samples 0, 3, 6
    assert(Media.mp4KeyframePayloads(seg).map(_._1) == Seq(0, 3, 6))
    // a torn segment (sample range past EOF) throws, never mis-walks
    val torn = java.util.Arrays.copyOfRange(seg, 0, seg.length - 4)
    intercept[Exception] { Media.mp4FramePayloads(torn) }
    // non-segment moov-less bytes still fail loudly
    intercept[Exception] {
      Media.parseMp4(java.util.Arrays.copyOfRange(seg, 0, 20))
    }
  }

  test("fMP4 scrub is size-preserving and leaves the fragment walk intact") {
    val samples = (0 until 5).map(i => Array[Byte](i.toByte, 9))
    val bytes = Media.encodeFmp4("isom", 30000L, 1001L, 320, 240,
      samples.grouped(2).toSeq,
      udta = "GRAFT-PII artist=7 gps=+1.1+2.2/".getBytes("US-ASCII"))
    assert(new String(bytes, "ISO-8859-1").contains("GRAFT-PII"))
    val scrubbed = Media.stripMediaMeta(bytes)
    assert(scrubbed.length == bytes.length) // in place: offsets stay valid
    assert(!new String(scrubbed, "ISO-8859-1").contains("GRAFT-PII"))
    assert(Media.parseMp4(scrubbed) == Media.parseMp4(bytes))
    assert(Media.mp4FramePayloads(scrubbed).map(_.toSeq) ==
      samples.map(_.toSeq))
  }

  test("genNoiseVideosAvOrder frames hash identical to the video-first noise MP4") {
    val df = Seq((1L, 42L, 3)).toDF("mid", "k", "n")
    val avFirst = Media.genNoiseVideosAvOrder(df, "mid", "k", "n", 9, 8)
    val vFirst = Media.genNoiseVideos(
      df.withColumn("mp4", lit(true)), "mid", "k", "n", "mp4", 9, 8)
    val a = Media.videoFrames(avFirst, "mid", "content")
      .select("frame_idx", "dhash").as[(Int, Long)].collect().sortBy(_._1).toSeq
    val v = Media.videoFrames(vFirst, "mid", "content")
      .select("frame_idx", "dhash").as[(Int, Long)].collect().sortBy(_._1).toSeq
    assert(a == v && a.size == 3)
  }

  test("lenient scrub: good rows bit-equal strict, junk passes through flagged") {
    val wav = Media.genWavs(Seq((1L, 8000, 1, 40)).toDF("id", "rate", "ch", "fr"),
      "id", "rate", "ch", "fr").select("content").as[Array[Byte]].head()
    val tagged = Media.genInfoTagged(
      Seq((1L, wav, "GRAFT-PII artist=1")).toDF("id", "content", "artist"),
      "id", "content", "artist").select("content").as[Array[Byte]].head()
    val junk = "not a container".getBytes
    val out = Media.stripMediaMetadataLenient(
      Seq((1L, tagged), (2L, junk)).toDF("id", "content"), "id", "content")
      .select("id", "content", "bytes_removed", "scrub_ok", "scrub_err")
      .as[(Long, Array[Byte], Int, Boolean, Option[String])]
      .collect().sortBy(_._1).toSeq
    // the good row is BIT-EQUAL to the strict path's output
    assert(out(0)._4 && out(0)._5.isEmpty)
    assert(out(0)._2.sameElements(Media.stripMediaMeta(tagged)))
    assert(out(0)._3 == tagged.length - out(0)._2.length && out(0)._3 > 0)
    // the junk row keeps its ORIGINAL bytes (re-quarantinable downstream)
    // with the explicit PII-may-remain flag — and the task did not fail
    assert(!out(1)._4 && out(1)._5.contains("IllegalArgumentException"))
    assert(out(1)._2.sameElements(junk) && out(1)._3 == 0)
    // image twin: same contract over the image containers
    val png = Media.pngWithOrientation(
      Media.encodeGrayPng(pattern(2L, 0, 9, 8), 9, 8), 3)
    val iout = Media.stripImageMetadataLenient(
      Seq((1L, png), (2L, junk)).toDF("id", "content"), "id", "content")
      .select("id", "content", "scrub_ok", "scrub_err")
      .as[(Long, Array[Byte], Boolean, Option[String])]
      .collect().sortBy(_._1).toSeq
    assert(iout(0)._3 && iout(0)._2.sameElements(Media.stripImageMeta(png)))
    assert(!iout(1)._3 && iout(1)._2.sameElements(junk) &&
      iout(1)._4.contains("IllegalArgumentException"))
  }

  test("maxFrames caps per-video decode: strict throws, lenient quarantines") {
    val df = Seq((1L, 3L, 2), (2L, 9L, 4)).toDF("id", "k", "n")
    val avis = Media.genPatternAvis(df, "id", "k", "n", w = 9, h = 8)
    // cap above both: everything decodes
    assert(Media.videoFrames(avis, "id", "content", maxFrames = 4).count() == 6)
    // cap between the two: strict fails the job…
    intercept[org.apache.spark.SparkException] {
      Media.videoFrames(avis, "id", "content", maxFrames = 3).collect()
    }
    // …lenient quarantines ONLY the over-cap video (no frame prefix)
    val out = Media.videoFramesLenient(avis, "id", "content", maxFrames = 3)
      .select("id", "frame_ok").as[(Long, Boolean)].collect().toSeq
    assert(out.filter(_._1 == 1L).map(_._2) == Seq(true, true))
    assert(out.filter(_._1 == 2L) == Seq((2L, false)))
  }

  test("stripMediaMeta: WAV/AVI INFO tags drop, MP4 udta zeroes in place") {
    // WAV: LIST(INFO) removed, header facts identical
    val wav = Media.encodeWav(16000, 2, Array.tabulate[Short](320)(_.toShort))
    val taggedWav = Media.genInfoTagged(
      Seq((1L, wav)).toDF("id", "content").withColumn("a",
        lit("GRAFT-PII Artist")), "id", "content", "a")
      .select("content").as[Array[Byte]].head()
    assert(new String(taggedWav, "ISO-8859-1").contains("GRAFT-PII"))
    assert(Media.parseWav(taggedWav) == Media.parseWav(wav).copy(
      dataOff = Media.parseWav(taggedWav).dataOff)) // INFO shifts data
    val sWav = Media.stripMediaMeta(taggedWav)
    assert(!new String(sWav, "ISO-8859-1").contains("GRAFT-PII"))
    assert(sWav.length < taggedWav.length)
    val (m0, m1) = (Media.parseWav(wav), Media.parseWav(sWav))
    assert(m1.sampleRate == m0.sampleRate && m1.channels == m0.channels &&
      m1.dataBytes == m0.dataBytes)
    // AVI: INFO removed, frames decode identically
    val avi = Media.genPatternAvis(Seq((1L, 5L, 3)).toDF("id", "k", "n"),
      "id", "k", "n", 9, 8).select("content").as[Array[Byte]].head()
    val taggedAvi = Media.genInfoTagged(
      Seq((1L, avi)).toDF("id", "content").withColumn("a",
        lit("GRAFT-PII Cam")), "id", "content", "a")
      .select("content").as[Array[Byte]].head()
    val sAvi = Media.stripMediaMeta(taggedAvi)
    assert(!new String(sAvi, "ISO-8859-1").contains("GRAFT-PII"))
    assert(Media.parseAvi(sAvi) == Media.parseAvi(avi))
    assert(Media.aviFramePayloads(sAvi).map(_.toSeq) ==
      Media.aviFramePayloads(avi).map(_.toSeq))
    // MP4: udta neutralized IN PLACE — same length, marker byte-gone,
    // header facts AND the sample walk (absolute stco offsets!) intact
    val mp4 = Media.encodeMp4("isom", 30000L, 1001L * 2, Seq((9, 8)),
      Seq("AB".getBytes, "CDE".getBytes), 1001L,
      udta = "GRAFT-PII gps=+1.2-3.4/".getBytes)
    val sMp4 = Media.stripMediaMeta(mp4)
    assert(sMp4.length == mp4.length)
    assert(new String(mp4, "ISO-8859-1").contains("GRAFT-PII"))
    assert(!new String(sMp4, "ISO-8859-1").contains("GRAFT-PII"))
    assert(Media.parseMp4(sMp4) == Media.parseMp4(mp4))
    assert(Media.mp4FramePayloads(sMp4).map(new String(_)) == Seq("AB", "CDE"))
    // PNG/JPEG delegate to stripImageMeta; garbage throws
    assert(Media.stripMediaMeta(Media.pngWithOrientation(
      Media.encodeGrayPng(pattern(2L, 0, 9, 8), 9, 8), 3)).length <
      Media.pngWithOrientation(
        Media.encodeGrayPng(pattern(2L, 0, 9, 8), 9, 8), 3).length)
    intercept[IllegalArgumentException] {
      Media.stripMediaMeta("not media".getBytes)
    }
  }

  test("decodeMp4Meta derives floor duration and fps from the box walk") {
    val ids = Seq((7L, 12800L, 512L, 25, 480, 360, false))
      .toDF("id", "ts", "dl", "n", "w", "h", "audio")
    val out = Media.decodeMp4Meta(
      Media.genMp4s(ids, "id", "ts", "dl", "n", "w", "h", "audio"),
      "id", "content")
      .select("major_brand", "timescale", "duration_ms", "n_tracks",
        "width", "height", "n_frames", "fps_x1000")
      .as[(String, Long, Long, Int, Int, Int, Int, Long)].head()
    // duration_ms = 25·512·1000/12800 = 1000; fps = 12800·1000/512 = 25000
    assert(out == (("isom", 12800L, 1000L, 1, 480, 360, 25, 25000L)))
  }
}
