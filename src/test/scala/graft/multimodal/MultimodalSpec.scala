package graft.multimodal

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class MultimodalSpec extends AnyFunSuite with SparkTestBase {

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("binary payload column round-trips document bytes") {
    val media = Multimodal.asMedia(docs)
    assert(media.schema("payload").dataType.typeName == "binary")
    val row = media.filter(col("media_id") === 0).head()
    val text = docs.filter(col("doc_id") === 0).select("text").head().getString(0)
    assert(new String(row.payload, "UTF-8") == text)
  }

  test("batched feature extraction is deterministic and complete") {
    val media = Multimodal.asMedia(docs)
    val feats = Multimodal.extractFeatures(media, batchSize = 16).cache()
    assert(feats.count() == docs.count())
    // md5 agrees with Spark's native md5 over the same bytes (and therefore
    // with the DuckDB oracle's md5(text))
    val joined = feats.toDF().join(
      docs.select(col("doc_id").cast("long").as("media_id"),
        md5(encode(col("text"), "UTF-8")).as("expected_md5")), "media_id")
    assert(joined.filter(col("content_md5") =!= col("expected_md5")).count() == 0)
    // features deterministic across runs
    val again = Multimodal.extractFeatures(media, batchSize = 7)
    val a = feats.orderBy("media_id").collect()
    val b = again.orderBy("media_id").collect()
    assert(a.zip(b).forall { case (x, y) =>
      x.feature.sameElements(y.feature) && x.width == y.width })
  }

  private def imageBytes(format: String, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xff0000)
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, format, out), s"no $format writer")
    out.toByteArray
  }

  test("header sniffing returns true dimensions for real PNG/GIF/JPEG bytes") {
    // real encoders (JDK ImageIO), real header parsing — not the stub path
    assert(MediaCodec.sniffDimensions(imageBytes("png", 300, 200)).contains((300, 200)))
    assert(MediaCodec.sniffDimensions(imageBytes("gif", 320, 240)).contains((320, 240)))
    assert(MediaCodec.sniffDimensions(imageBytes("jpg", 640, 480)).contains((640, 480)))
    // decode() surfaces the sniffed dimensions
    val (w, h, _) = MediaCodec.decode(imageBytes("png", 123, 45))
    assert((w, h) == (123, 45))
  }

  test("header sniffing rejects garbage and truncated payloads, stub fallback engages") {
    assert(MediaCodec.sniffDimensions("not an image at all".getBytes("UTF-8")).isEmpty)
    assert(MediaCodec.sniffDimensions(Array[Byte]()).isEmpty)
    assert(MediaCodec.sniffDimensions(imageBytes("png", 10, 10).take(12)).isEmpty)
    // JPEG cut before any SOF marker
    assert(MediaCodec.sniffDimensions(Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte)).isEmpty)
    // legal 0xFF fill bytes before a marker must be skipped, not rejected
    // (ISO 10918-1 B.1.1.2): SOI, fill, then SOF0 with 300x200
    val filled = Array(0xff, 0xd8, 0xff, 0xff, 0xff, 0xc0,
      0x00, 0x11, 0x08, 0x00, 0xc8, 0x01, 0x2c, 0x03).map(_.toByte)
    assert(MediaCodec.sniffDimensions(filled).contains((300, 200)))
    // unrecognized payloads keep the deterministic stub dimensions
    val text = "plain text payload".getBytes("UTF-8")
    val (w, h, _) = MediaCodec.decode(text)
    assert(w == 64 + (text(0) & 0x7f) && h == 64 + (text(1) & 0x7f))
  }

  test("mm43 oracle precondition: fixture texts never collide with image magic") {
    // mm43's DuckDB oracle applies the stub-dims formula unconditionally,
    // while decode() sniffs real headers first. The only image magic
    // reachable from UTF-8 text bytes is GIF's (PNG's 0x89 and JPEG's 0xFF
    // cannot lead valid UTF-8); the stub formula also assumes the first two
    // payload bytes equal the first two character codes (ASCII). Pin both
    // invariants at every SF so a fixture change fails here, not in the
    // hash gate.
    for (sf <- Seq("0.001", "0.01", "0.1")) {
      val d = spark.read.parquet(s"/root/testdata/sf$sf/documents.parquet")
      assert(d.filter(col("text").startsWith("GIF87a") ||
        col("text").startsWith("GIF89a")).count() == 0, s"GIF magic at sf$sf")
      assert(d.filter(!col("text").rlike("^[\\x00-\\x7F]{2}")).count() == 0,
        s"non-ASCII leading chars at sf$sf")
    }
  }

  test("real decode: ImageIO pixel stats match the synthetic-pixel formula exactly") {
    val id = 7L; val w = 13; val h = 11
    val (dw, dh, feat) = MediaCodec.decode(SyntheticImages.gradientPng(id, w, h))
    assert((dw, dh) == (w, h))
    assert(feat.length == 11)
    // brute-force the expected integer stats from the formula (the same
    // arithmetic the mm45 DuckDB oracle uses)
    var rs = 0L; var gs = 0L; var bs = 0L
    val hist = new Array[Long](8)
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = SyntheticImages.gradientRgb(id, x, y)
      val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
      rs += r; gs += g; bs += b
      hist(((299 * r + 587 * g + 114 * b) / 1000) / 32) += 1
    }
    val n = w.toDouble * h
    assert(math.rint(feat(0) * n).toLong == rs)
    assert(math.rint(feat(1) * n).toLong == gs)
    assert(math.rint(feat(2) * n).toLong == bs)
    for (k <- 0 until 8)
      assert(math.rint(feat(3 + k) * n).toLong == hist(k), s"lum bin $k")
  }

  test("aHash: identical images collide, distinct differ, uniform image hashes to zero") {
    def hashOf(id: Long, w: Int, h: Int): (Long, Long) =
      MediaCodec.aHash(
        MediaCodec.decodeImage(SyntheticImages.gradientPng(id, w, h)).get)
    // same parameters -> bit-identical hash (the mm47 collision contract)
    assert(hashOf(3L, 13, 11) == hashOf(3L, 13, 11))
    // different content -> different fingerprints on the gradient family
    assert(hashOf(3L, 13, 11) != hashOf(4L, 13, 11))
    // halves are non-negative 32-bit values (SQL-safe, no sign games)
    val (hi, lo) = hashOf(9L, 16, 16)
    assert(hi >= 0L && hi <= 0xffffffffL && lo >= 0L && lo <= 0xffffffffL)
    // strict > threshold: a uniform image (every lum == mean) sets NO bits
    val solid = MediaCodec.decodeImage(
      SyntheticImages.solidPng(120, 90, 33, 10, 10)).get
    assert(MediaCodec.aHash(solid) == ((0L, 0L)))
    // brute-force the bit convention against the formula for one image
    val (id, w, h) = (7L, 13, 11)
    val lums = (0 until 64).map { k =>
      val gx = k % 8; val gy = k / 8
      val rgb = SyntheticImages.gradientRgb(id, gx * w / 8, gy * h / 8)
      val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
      (299L * r + 587L * g + 114L * b) / 1000L
    }
    val total = lums.sum
    var eHi = 0L; var eLo = 0L
    for (k <- 0 until 64 if 64L * lums(k) > total)
      if (k < 32) eLo |= 1L << k else eHi |= 1L << (k - 32)
    assert(hashOf(id, w, h) == ((eHi, eLo)))
  }

  test("real decode engages for JPEG too (lossy: dims exact, stats real floats)") {
    val (w, h, feat) = MediaCodec.decode(imageBytes("jpg", 32, 24))
    assert((w, h) == (32, 24))
    assert(feat.length == 11) // real pixel path, not the 8-float stub
  }

  test("real resize: nearest-neighbor preserves a solid color exactly") {
    val png = SyntheticImages.solidPng(200, 100, 50, 30, 20)
    val resized = MediaCodec.resizeBytes(png, 16).get
    val img = MediaCodec.decodeImage(resized).get
    assert((img.getWidth, img.getHeight) == MediaCodec.resize(30, 20, 16))
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
      assert((img.getRGB(x, y) & 0xffffff) == ((200 << 16) | (100 << 8) | 50))
    // undecodable payloads refuse rather than fake
    assert(MediaCodec.resizeBytes("not an image".getBytes("UTF-8"), 16).isEmpty)
  }

  test("codec contracts: resize dims fit and frame sampling (video stub)") {
    assert(MediaCodec.resize(1920, 1080, 512) == (512, 288))
    assert(MediaCodec.resize(100, 50, 512) == (100, 50))
    val offs = MediaCodec.sampleFrameOffsets(1000, 300, 10)
    assert(offs == Seq(0L, 300L, 600L, 900L))
    assert(MediaCodec.sampleFrameOffsets(100000, 1, 5).length == 5)
  }

  test("real WAV decode: RIFF parse recovers the synthetic sample formula exactly") {
    val wav = SyntheticImages.pcmWav(id = 5L, sampleRate = 16000,
      channels = 2, nFrames = 500)
    val st = MediaCodec.decodeWav(wav).get
    assert(st.sampleRate == 16000 && st.channels == 2 &&
      st.bitsPerSample == 16 && st.nFrames == 500L)
    // brute-force reference from the formula
    val samples = for (f <- 0 until 500; c <- 0 until 2)
      yield SyntheticImages.pcmSample(5L, c, f)
    assert(st.sampleSum == samples.map(_.toLong).sum)
    assert(st.sampleSumSq == samples.map(s => s.toLong * s).sum)
    assert(st.peakAbs == samples.map(math.abs).max)
    // chunk walking survives an extra chunk BEFORE fmt/data (real-world
    // WAVs carry LIST/INFO chunks) including odd-size padding
    val extra = java.nio.ByteBuffer
      .allocate(wav.length + 8 + 4) // "LIST" + size 3 + 3 bytes + pad
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    extra.put(wav, 0, 12)
    extra.put("LIST".getBytes("US-ASCII")).putInt(3)
      .put(Array[Byte](1, 2, 3, 0))
    extra.put(wav, 12, wav.length - 12)
    val arr = extra.array()
    // fix RIFF size field (not verified by the parser, but keep it honest)
    val st2 = MediaCodec.decodeWav(arr).get
    assert(st2 == st, "an interposed LIST chunk must not change the parse")
    // non-WAV and truncated payloads are None, never garbage
    assert(MediaCodec.decodeWav("not a wav at all".getBytes).isEmpty)
    assert(MediaCodec.decodeWav(wav.take(30)).isEmpty)
    // 8-bit PCM path: hand-build a 4-sample mono file
    val w8 = java.nio.ByteBuffer.allocate(44 + 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    w8.put("RIFF".getBytes).putInt(36 + 4).put("WAVE".getBytes)
    w8.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
      .putInt(8000).putInt(8000).putShort(1).putShort(8)
    w8.put("data".getBytes).putInt(4)
    w8.put(Array[Byte](0, 128.toByte, 255.toByte, 130.toByte)) // -128,0,127,2
    val st8 = MediaCodec.decodeWav(w8.array()).get
    assert(st8.bitsPerSample == 8 && st8.nFrames == 4L)
    assert(st8.sampleSum == (-128L + 0 + 127 + 2) && st8.peakAbs == 128)
    // a crafted chunk size near 2^32 (wraps negative as Int) must be a
    // fail-loud None, not an infinite chunk walk
    val huge = java.nio.ByteBuffer.allocate(wav.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    huge.put(wav)
    huge.putInt(16, 0xFFFFFFF8) // first chunk ("fmt ") size field
    assert(MediaCodec.decodeWav(huge.array()).isEmpty,
      "2^31-crossing chunk size must fail loud, not hang")
    // a declared size running past end-of-input is truncation → None
    val over = wav.clone()
    val bb = java.nio.ByteBuffer.wrap(over)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(16, wav.length) // fmt chunk claims more bytes than exist
    assert(MediaCodec.decodeWav(over).isEmpty)
  }

  test("real Y4M decode: container parse recovers the synthetic luma formula exactly") {
    val vid = SyntheticImages.y4m(id = 3L, w = 10, h = 8, nFrames = 3)
    val st = MediaCodec.decodeY4m(vid).get
    assert(st.width == 10 && st.height == 8 && st.nFrames == 3L)
    val lumas = for (f <- 0 until 3; y <- 0 until 8; x <- 0 until 10)
      yield SyntheticImages.lumaByte(3L, f, x, y)
    assert(st.ySum == lumas.map(_.toLong).sum)
    assert(st.ySumSq == lumas.map(v => v.toLong * v).sum)
    // truncated stream (half a frame) fails loud, never a partial count
    assert(MediaCodec.decodeY4m(vid.take(vid.length - 5)).isEmpty)
    // non-Y4M payloads are None
    assert(MediaCodec.decodeY4m("RIFF....WAVE".getBytes).isEmpty)
    // mono chroma layout: no chroma planes to skip
    val header = "YUV4MPEG2 W4 H2 F25:1 Cmono\n".getBytes("US-ASCII")
    val frame = "FRAME\n".getBytes("US-ASCII") ++
      Array.tabulate[Byte](8)(k => (k * 10).toByte)
    val mono = header ++ frame ++ frame
    val m = MediaCodec.decodeY4m(mono).get
    assert(m.nFrames == 2L && m.ySum == 2L * (0 to 7).map(_ * 10).sum)
    // out-of-Int-range W token is malformed → None (not NumberFormatException)
    val bigW = "YUV4MPEG2 W99999999999 H2 F25:1 Cmono\n".getBytes("US-ASCII") ++ frame
    assert(MediaCodec.decodeY4m(bigW).isEmpty)
    // dimensions whose plane product overflows Int must be None, not a
    // negative frameBytes mis-walk
    val ovf = "YUV4MPEG2 W60000 H60000 F25:1 C444\n".getBytes("US-ASCII") ++ frame
    assert(MediaCodec.decodeY4m(ovf).isEmpty)
  }

  test("MP3 frame walk: header arithmetic recovers the synthetic stream " +
      "formulas exactly; malformed streams fail loud") {
    // ids exercising: ID3v2 prefix (0, 30), ID3v1 trailer (0, 6, 30),
    // mono (0, 4), every sample rate, VBR bitrate patterns
    for (i <- Seq(0L, 1L, 2L, 4L, 5L, 6L, 30L, 63L)) {
      val nf = (5 + i % 7).toInt
      val st = MediaCodec.walkMp3(SyntheticImages.mp3Stream(i, nf)).get
      assert(st.nFrames == nf.toLong, s"id=$i")
      assert(st.sampleRate == Array(44100, 48000, 32000)((i % 3).toInt))
      assert(st.channels == (if (i % 4 == 0) 1 else 2))
      val kbpsTable = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128,
        160, 192, 224, 256, 320)
      val kbps = (0 until nf).map(f => kbpsTable((1 + (i * 7 + f * 3) % 14).toInt))
      assert(st.kbpsMin == kbps.min && st.kbpsMax == kbps.max &&
        st.kbpsSum == kbps.map(_.toLong).sum, s"id=$i")
      assert(st.durationMicros == st.nFrames * 1152L * 1000000L / st.sampleRate)
    }
    val good = SyntheticImages.mp3Stream(1L, 6)
    // truncating the last frame is a malformed stream, never a partial count
    assert(MediaCodec.walkMp3(good.dropRight(1)).isEmpty)
    // corrupting the first sync byte must be None immediately
    val broken = good.clone()
    broken(0) = 0x00
    assert(MediaCodec.walkMp3(broken).isEmpty)
    // free-format (bitrate idx 0) and reserved (15) are out of scope → None
    val free = good.clone(); free(2) = (free(2) & 0x0F).toByte
    assert(MediaCodec.walkMp3(free).isEmpty)
    // a non-synchsafe ID3v2 size byte is malformed → None
    val badId3 = Array[Byte]('I', 'D', '3', 4, 0, 0, 0, 0, 0, 0x80.toByte) ++ good
    assert(MediaCodec.walkMp3(badId3).isEmpty)
    // trailing garbage that is not an exact ID3v1 block → None
    assert(MediaCodec.walkMp3(good ++ Array[Byte](1, 2, 3)).isEmpty)
    // a mid-stream sample-rate change is a malformed stream → None
    val mixed = SyntheticImages.mp3Stream(1L, 3) ++ SyntheticImages.mp3Stream(2L, 3)
    assert(MediaCodec.walkMp3(mixed).isEmpty)
  }

  test("H.264 NAL walk: start-code census recovers the synthetic stream " +
      "formulas exactly; malformed streams fail loud") {
    for (i <- Seq(0L, 1L, 7L, 63L)) {
      val n = (4 + i % 6).toInt
      val st = MediaCodec.walkH264(SyntheticImages.h264Stream(i, n)).get
      assert(st.nNals == n.toLong && st.nSps == 1L && st.nPps == 1L,
        s"id=$i: $st")
      val expIdr = (0 until n).count(u => u >= 2 && u % 5 == 2)
      assert(st.nIdr == expIdr.toLong &&
        st.nNonIdr == (n - 2 - expIdr).toLong && st.nOther == 0L, s"id=$i")
      val expBytes = (0 until n).map(u => 1L + 10 + (i * 3 + u * 7) % 50).sum
      assert(st.unitBytes == expBytes, s"id=$i")
    }
    val good = SyntheticImages.h264Stream(3L, 6)
    // a stream not beginning with a start code fails loud
    assert(MediaCodec.walkH264(Array[Byte](0x65, 1, 2) ++ good).isEmpty)
    // a set forbidden_zero_bit fails loud (corrupt the first header byte)
    val forb = good.clone(); forb(4) = (forb(4) | 0x80).toByte
    assert(MediaCodec.walkH264(forb).isEmpty)
    // an empty unit (start code immediately followed by another) fails
    assert(MediaCodec.walkH264(
      Array[Byte](0, 0, 0, 1) ++ Array[Byte](0, 0, 1) ++ good.drop(4)).isEmpty)
    assert(MediaCodec.walkH264(Array.empty[Byte]).isEmpty)
  }
}
