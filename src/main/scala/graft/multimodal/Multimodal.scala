package graft.multimodal

import java.awt.RenderingHints
import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.security.MessageDigest
import javax.imageio.ImageIO
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for a training-data pipeline.
  *
  * Media (image/audio/video) travels as an opaque `binary` column plus a
  * typed metadata struct; per-item work (decode, feature-extract, resize,
  * frame-sample) runs as BATCHED per-partition functions — the Scala analog
  * of Python's `mapInPandas`: one buffer of rows per call amortizes codec
  * setup, and partition count controls parallelism, so the same code drives
  * 32 local threads or 1000 executors.
  *
  * IMAGE decode/resize/features are REAL: the JDK ships PNG/GIF/JPEG codecs
  * in `javax.imageio` (java.desktop, headless-safe), so [[MediaCodec.decode]]
  * produces true dimensions and true pixel statistics for those types.
  * RAW AUDIO is REAL too (r8): [[MediaCodec.decodeWav]] parses PCM/WAV
  * containers — pure-JVM RIFF chunk walking, no codec library — into exact
  * integer energy statistics (driver-oracled in mm49). COMPRESSED
  * audio/video codecs genuinely are not in the JDK or this container, so
  * those paths remain clearly-marked deterministic stubs; the schema,
  * batching, partitioning and null contracts around them are real and
  * tested.
  */
final case class MediaItem(
    media_id: Long,
    mime_type: String,
    payload: Array[Byte])

final case class MediaFeatures(
    media_id: Long,
    mime_type: String,
    byte_length: Long,
    content_md5: String,
    width: Int,
    height: Int,
    feature: Array[Float])

object MediaCodec {

  // BufferedImage + Graphics2D are headless-safe; pin the property so a
  // stray DISPLAY on an executor never routes AWT to a real toolkit.
  System.setProperty("java.awt.headless", "true")

  /** REAL header-sniffed dimensions for PNG / GIF / JPEG payloads — pure
    * JVM parsing of the public container formats, no codec library needed:
    *  - PNG: 8-byte signature, then the IHDR chunk fixes width/height as
    *    big-endian u32 at offsets 16/20 (PNG spec §5.2, §11.2.2);
    *  - GIF: "GIF87a"/"GIF89a", logical-screen width/height as
    *    little-endian u16 at offsets 6/8 (GIF89a spec §18);
    *  - JPEG: walk the FF-marker segment chain to the first SOF frame
    *    header; height/width are big-endian u16 at SOF payload offsets
    *    3/5 (ISO/IEC 10918-1 B.2.2).
    * Returns None for unrecognized or truncated payloads.
    */
  def sniffDimensions(p: Array[Byte]): Option[(Int, Int)] = {
    def u8(i: Int): Int = p(i) & 0xff
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def be32(i: Int): Int = (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    if (p.length >= 24 && u8(0) == 0x89 && p(1) == 'P' && p(2) == 'N' &&
        p(3) == 'G' && u8(4) == 0x0d && u8(5) == 0x0a && u8(6) == 0x1a &&
        u8(7) == 0x0a)
      Some((be32(16), be32(20)))
    else if (p.length >= 10 && p(0) == 'G' && p(1) == 'I' && p(2) == 'F' &&
        p(3) == '8' && (p(4) == '7' || p(4) == '9') && p(5) == 'a')
      Some((le16(6), le16(8)))
    else if (p.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      var i = 2
      while (i + 9 < p.length) {
        if (u8(i) != 0xff) return None // corrupt marker chain
        val marker = u8(i + 1)
        if (marker == 0xff) i += 1 // legal fill byte before a marker (B.1.1.2)
        else if (marker == 0xd8 || marker == 0x01 ||
            (marker >= 0xd0 && marker <= 0xd7)) i += 2 // standalone markers
        else if (marker == 0xda || marker == 0xd9) return None // SOS/EOI before any SOF
        else {
          val len = be16(i + 2)
          if (len < 2) return None
          val isSof = (marker >= 0xc0 && marker <= 0xcf) &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc // not DHT/JPG/DAC
          if (isSof) return Some((be16(i + 7), be16(i + 5)))
          i += 2 + len
        }
      }
      None
    } else None
  }

  /** REAL pixel decode for the image types the JDK ships codecs for
    * (PNG/GIF/JPEG via `javax.imageio`). Gated on [[sniffDimensions]] so
    * non-image payloads never pay the reader-probe cost; returns None for
    * payloads the JDK cannot decode (truncated data, audio/video, text).
    */
  def decodeImage(payload: Array[Byte]): Option[BufferedImage] =
    sniffDimensions(payload).flatMap { _ =>
      try Option(ImageIO.read(new ByteArrayInputStream(payload)))
      catch { case _: Exception => None }
    }

  /** Exact integer pixel statistics: per-channel sums plus an 8-bin integer
    * luminance histogram (lum = (299r+587g+114b)/1000 with integer division,
    * bin = lum/32). Integer arithmetic end to end, so a SQL oracle can
    * recompute them exactly from a pixel formula (see mm45/mm46).
    */
  final case class ImageStats(n: Long, rSum: Long, gSum: Long, bSum: Long,
      lumHist: Array[Long])

  def imageStats(img: BufferedImage): ImageStats = {
    val w = img.getWidth; val h = img.getHeight
    var rs = 0L; var gs = 0L; var bs = 0L
    val hist = new Array[Long](8)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
        rs += r; gs += g; bs += b
        hist(((299 * r + 587 * g + 114 * b) / 1000) / 32) += 1
        x += 1
      }
      y += 1
    }
    ImageStats(w.toLong * h, rs, gs, bs, hist)
  }

  /** Decode.
    *
    * REAL path (PNG/GIF/JPEG): `javax.imageio` decode → true dimensions and
    * an 11-float feature vector of true pixel statistics — per-channel means
    * (0..2) and the normalized 8-bin luminance histogram (3..10), both
    * exactly recoverable as the integer [[imageStats]] via
    * `rint(feature * n)` (driver-oracled in mm45/mm46).
    *
    * STUB path (everything else — audio/video codecs are genuinely absent
    * from the JDK and this container): deterministic dimensions derived from
    * the first payload bytes (a recognized-but-undecodable image header still
    * gets its REAL sniffed dimensions) and a clearly-marked rolling-byte-hash
    * 8-float "embedding". The batching, schema and null contracts around
    * both paths are real.
    */
  def decode(payload: Array[Byte]): (Int, Int, Array[Float]) =
    decodeImage(payload) match {
      case Some(img) =>
        val st = imageStats(img)
        val n = st.n.toDouble
        val feat = new Array[Float](11)
        feat(0) = (st.rSum / n).toFloat
        feat(1) = (st.gSum / n).toFloat
        feat(2) = (st.bSum / n).toFloat
        var k = 0
        while (k < 8) { feat(3 + k) = (st.lumHist(k) / n).toFloat; k += 1 }
        (img.getWidth, img.getHeight, feat)
      case None =>
        val (w, h) = sniffDimensions(payload).getOrElse((
          64 + (if (payload.nonEmpty) (payload(0) & 0x7f) else 0),
          64 + (if (payload.length > 1) (payload(1) & 0x7f) else 0)))
        val feat = new Array[Float](8)
        var acc = 17L
        var i = 0
        while (i < payload.length) { acc = acc * 31 + (payload(i) & 0xff); i += 1
          feat(i % 8) += ((acc % 1000).toFloat / 1000f) }
        (w, h, feat)
    }

  /** REAL PCM/WAV decode stats — pure-JVM RIFF parsing (the WAV container
    * is public-format knowledge: "RIFF"<size>"WAVE" then 8-byte-headed
    * chunks; the PCM `fmt ` chunk fixes channels/rate/width, `data` holds
    * interleaved little-endian samples), so RAW AUDIO — the container a
    * training pipeline ingests before feature extraction — decodes with
    * zero codec dependencies, exactly like the ImageIO path for images.
    * Returns EXACT integer statistics (frame count, peak |sample|, sample
    * sum, sample sum-of-squares — the energy/clipping screens an audio
    * curation run filters on) so the whole decode is hash-oracle-able
    * (mm49 recomputes them from the synthetic sample formula in DuckDB).
    * 16-bit and 8-bit PCM (format 1); None for anything else (compressed
    * audio/video codecs remain genuinely absent from the JDK — still the
    * documented stub in [[decode]]).
    */
  final case class WavStats(sampleRate: Int, channels: Int,
      bitsPerSample: Int, nFrames: Long, peakAbs: Int, sampleSum: Long,
      sampleSumSq: Long)

  def decodeWav(p: Array[Byte]): Option[WavStats] = {
    def le16(i: Int): Int = (p(i) & 0xFF) | ((p(i + 1) & 0xFF) << 8)
    def le32(i: Int): Long =
      (p(i) & 0xFFL) | ((p(i + 1) & 0xFFL) << 8) |
        ((p(i + 2) & 0xFFL) << 16) | ((p(i + 3) & 0xFFL) << 24)
    def tag(i: Int): String = new String(p, i, 4, "US-ASCII")
    if (p.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var off = 12
    var fmt: Option[(Int, Int, Int, Int)] = None // format, channels, rate, bits
    var stats: Option[(Long, Int, Long, Long)] = None
    while (off + 8 <= p.length) {
      val id = tag(off)
      // Chunk size is UNSIGNED 32-bit: keep it as Long. A declared size that
      // runs past end-of-input is a truncated/crafted payload → fail-loud
      // None (never clamp-and-continue: a 0xFFFFFFF8-class size cast to Int
      // would wrap negative and stop `off` advancing — an infinite loop).
      val sizeL = le32(off + 4)
      if (sizeL > p.length.toLong - (off + 8)) return None
      val size = sizeL.toInt
      val body = off + 8
      if (id == "fmt " && size >= 16)
        fmt = Some((le16(body), le16(body + 2), le32(body + 4).toInt,
          le16(body + 14)))
      else if (id == "data") fmt.foreach { case (format, ch, _, bits) =>
        if (format == 1 && (bits == 16 || bits == 8) && ch >= 1) {
          val bytesPerSample = bits / 8
          val n = math.min(size, p.length - body) / bytesPerSample
          var sum = 0L
          var sumSq = 0L
          var peak = 0
          var k = 0
          while (k < n) {
            val s =
              if (bits == 16) le16(body + k * 2).toShort.toInt
              else (p(body + k) & 0xFF) - 128 // 8-bit PCM is unsigned
            sum += s
            sumSq += s.toLong * s
            if (math.abs(s) > peak) peak = math.abs(s)
            k += 1
          }
          stats = Some((n.toLong / ch, peak, sum, sumSq))
        }
      }
      off = body + size + (size & 1) // chunks pad to even
    }
    for ((format, ch, rate, bits) <- fmt if format == 1 && (bits == 16 || bits == 8);
         (frames, peak, sum, sumSq) <- stats)
      yield WavStats(rate, ch, bits, frames, peak, sum, sumSq)
  }

  /** REAL raw-video decode — YUV4MPEG2 (Y4M, the mjpegtools raw container
    * a video pipeline holds between demux and model): plain-text stream
    * header (`YUV4MPEG2 W.. H.. .. C..`), then `FRAME` + planar YUV per
    * frame. Pure-JVM parsing, zero codec dependencies — the video analog
    * of [[decodeWav]]: frame extraction over RAW video is real; only
    * COMPRESSED codecs remain the documented stub. Returns exact integer
    * Y-plane (luma) statistics per stream — frame count and total/
    * sum-of-squares luma, the brightness/degenerate-frame screens a video
    * curation run filters on — all hash-oracle-able (mm50). C420
    * variants, C444, C422 and mono chroma layouts supported; anything
    * else → None. A stream
    * whose frames don't align to the declared plane sizes fails loud
    * (None), never a silent partial parse.
    */
  final case class Y4mStats(width: Int, height: Int, nFrames: Long,
      ySum: Long, ySumSq: Long)

  def decodeY4m(p: Array[Byte]): Option[Y4mStats] = {
    val magic = "YUV4MPEG2"
    if (p.length < magic.length + 1 ||
      new String(p, 0, magic.length, "US-ASCII") != magic) return None
    val nl = p.indexOf('\n'.toByte)
    if (nl < 0) return None
    val header = new String(p, 0, nl, "US-ASCII")
    val params = header.split(" ").drop(1)
    def param(prefix: Char): Option[String] =
      params.find(t => t.nonEmpty && t.head == prefix).map(_.tail)
    // W/H parse with toIntOption (an out-of-range token is malformed → None,
    // not NumberFormatException) and all plane arithmetic in Long: a huge
    // declared dimension must fail loud, not overflow Int into a negative
    // frameBytes that mis-walks the stream.
    val (w, h) =
      (param('W').flatMap(_.toIntOption), param('H').flatMap(_.toIntOption)) match {
        case (Some(a), Some(b)) if a > 0 && b > 0 => (a, b)
        case _ => return None
      }
    val chroma = param('C').getOrElse("420jpeg")
    val cSizeL: Long =
      if (chroma.startsWith("420")) (w / 2).toLong * (h / 2)
      else if (chroma.startsWith("422")) (w / 2).toLong * h
      else if (chroma.startsWith("444")) w.toLong * h
      else if (chroma == "mono") 0L
      else return None
    val frameBytesL = w.toLong * h + 2L * cSizeL
    // A stream too short to hold even one declared frame is malformed; this
    // bound also keeps every Int index below Int.MaxValue.
    if (frameBytesL > p.length.toLong) return None
    val frameBytes = frameBytesL.toInt
    var off = nl + 1
    var nFrames = 0L
    var ySum = 0L
    var ySumSq = 0L
    while (off < p.length) {
      // each frame starts with "FRAME" + optional params + '\n'
      if (off + 5 > p.length ||
        new String(p, off, 5, "US-ASCII") != "FRAME") return None
      val fnl = p.indexOf('\n'.toByte, off)
      if (fnl < 0) return None
      val yOff = fnl + 1
      if (yOff + frameBytes > p.length) return None
      var k = 0
      while (k < w * h) {
        val v = p(yOff + k) & 0xFF
        ySum += v
        ySumSq += v.toLong * v
        k += 1
      }
      nFrames += 1
      off = yOff + frameBytes
    }
    if (nFrames == 0) None
    else Some(Y4mStats(w, h, nFrames, ySum, ySumSq))
  }

  /** COMPRESSED-audio metadata walk — MPEG-1 Layer III (MP3) frame
    * headers, pure byte arithmetic (r10): what a crawl curation pipeline
    * actually needs from compressed audio is the duration/bitrate/
    * channel metadata to FILTER on, and that is a header walk, not a PCM
    * decode — every frame's length is a closed-form function of its
    * 4-byte header, so walking sync → header → hop covers the whole
    * stream without any codec library. This upgrades the codec stub's
    * honest boundary: metadata extraction over compressed audio is REAL
    * (this walker); only PCM synthesis (MDCT/huffman) remains the
    * environment-blocked stub — no pure-JDK path, no resolvable
    * dependency.
    *
    * Scope and fail-loud contract (the [[decodeWav]] stance): MPEG-1
    * Layer III only, bitrate indexes 1-14 (free-format and reserved →
    * None), sample-rate indexes 0-2; a leading ID3v2 tag (synchsafe
    * size, footer flag honored) is skipped, a trailing 128-byte ID3v1
    * "TAG" block is allowed at exact end; ANY malformed header,
    * truncated frame, mid-stream sample-rate/channel change, or trailing
    * garbage → None, never a partial parse.
    *
    * @return exact integer stats: sample rate, channels, frame count,
    *         per-frame-kbps min/max/sum (CBR iff min == max) and
    *         duration in microseconds (nFrames·1152·1e6 / rate, integer
    *         division — hash-oracle-able, mm52)
    */
  final case class Mp3Stats(sampleRate: Int, channels: Int, nFrames: Long,
      kbpsMin: Int, kbpsMax: Int, kbpsSum: Long, durationMicros: Long)

  private val Mp3Kbps =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val Mp3Rates = Array(44100, 48000, 32000)

  def walkMp3(p: Array[Byte]): Option[Mp3Stats] = {
    def u8(i: Int): Int = p(i) & 0xFF
    var off = 0
    // ID3v2: "ID3" vv flags + 4-byte SYNCHSAFE size (7 bits per byte),
    // body follows; flags bit 4 adds a 10-byte footer
    if (p.length >= 10 && p(0) == 'I' && p(1) == 'D' && p(2) == '3') {
      val size = (u8(6) << 21) | (u8(7) << 14) | (u8(8) << 7) | u8(9)
      if ((u8(6) | u8(7) | u8(8) | u8(9)) >= 0x80) return None // not synchsafe
      off = 10 + size + (if ((u8(5) & 0x10) != 0) 10 else 0)
      if (off >= p.length) return None
    }
    var sampleRate = 0
    var channels = 0
    var nFrames = 0L
    var kbpsMin = Int.MaxValue
    var kbpsMax = 0
    var kbpsSum = 0L
    while (off < p.length) {
      // trailing ID3v1 block: exactly 128 bytes of "TAG" at stream end
      if (p.length - off == 128 && p(off) == 'T' && p(off + 1) == 'A' &&
          p(off + 2) == 'G') {
        off = p.length
      } else {
        if (off + 4 > p.length) return None
        val b1 = u8(off); val b2 = u8(off + 1)
        val b3 = u8(off + 2); val b4 = u8(off + 3)
        // sync 11 bits, version MPEG-1 (11), layer III (01)
        if (b1 != 0xFF || (b2 & 0xF8) != 0xF8 || ((b2 >> 1) & 3) != 1)
          return None
        val brIdx = (b3 >> 4) & 0xF
        val srIdx = (b3 >> 2) & 3
        if (brIdx < 1 || brIdx > 14 || srIdx > 2) return None
        val kbps = Mp3Kbps(brIdx)
        val rate = Mp3Rates(srIdx)
        val ch = if (((b4 >> 6) & 3) == 3) 1 else 2
        if (nFrames == 0L) { sampleRate = rate; channels = ch }
        else if (rate != sampleRate || ch != channels) return None
        val pad = (b3 >> 1) & 1
        val frameLen = 144000 * kbps / rate + pad
        if (off + frameLen > p.length) return None // truncated frame
        nFrames += 1
        kbpsSum += kbps
        if (kbps < kbpsMin) kbpsMin = kbps
        if (kbps > kbpsMax) kbpsMax = kbps
        off += frameLen
      }
    }
    if (nFrames == 0L) None
    else Some(Mp3Stats(sampleRate, channels, nFrames, kbpsMin, kbpsMax,
      kbpsSum, nFrames * 1152L * 1000000L / sampleRate))
  }

  /** COMPRESSED-video metadata walk — H.264 Annex-B NAL units, the
    * [[walkMp3]] stance applied to video (r10): the demuxer's first pass
    * over an elementary stream is a start-code walk (00 00 01 /
    * 00 00 00 01), and the unit CENSUS it yields — how many SPS/PPS
    * parameter sets, IDR sync points and coded slices — is the
    * structural metadata a curation run filters on (streams without
    * parameter sets or sync points are undecodable uploads) before any
    * pixel ever decodes. Pure byte arithmetic; pixel reconstruction
    * remains the environment-blocked stub.
    *
    * Fail-loud contract: the stream must BEGIN with a start code; a set
    * forbidden_zero_bit or an empty unit → None, never a partial census.
    *
    * @return exact counts: total units, SPS (7), PPS (8), IDR slices
    *         (5), non-IDR slices (1), other types, and total unit bytes
    *         (header + payload, start codes excluded)
    */
  final case class H264Stats(nNals: Long, nSps: Long, nPps: Long,
      nIdr: Long, nNonIdr: Long, nOther: Long, unitBytes: Long)

  def walkH264(p: Array[Byte]): Option[H264Stats] = {
    def startCodeLen(i: Int): Int =
      if (i + 3 <= p.length && p(i) == 0 && p(i + 1) == 0 && p(i + 2) == 1) 3
      else if (i + 4 <= p.length && p(i) == 0 && p(i + 1) == 0 &&
        p(i + 2) == 0 && p(i + 3) == 1) 4
      else 0
    if (p.isEmpty || startCodeLen(0) == 0) return None
    var nNals = 0L; var nSps = 0L; var nPps = 0L
    var nIdr = 0L; var nNonIdr = 0L; var nOther = 0L
    var unitBytes = 0L
    var i = 0
    while (i < p.length) {
      val sc = startCodeLen(i)
      if (sc == 0) return None // must sit ON a start code here
      val unitStart = i + sc
      // unit runs to the next start code or end-of-stream
      var j = unitStart
      while (j < p.length && startCodeLen(j) == 0) j += 1
      if (j == unitStart) return None // empty unit
      val header = p(unitStart) & 0xFF
      if ((header & 0x80) != 0) return None // forbidden_zero_bit
      (header & 0x1F) match {
        case 7 => nSps += 1
        case 8 => nPps += 1
        case 5 => nIdr += 1
        case 1 => nNonIdr += 1
        case _ => nOther += 1
      }
      nNals += 1
      unitBytes += (j - unitStart).toLong
      i = j
    }
    Some(H264Stats(nNals, nSps, nPps, nIdr, nNonIdr, nOther, unitBytes))
  }

  /** Aspect-preserving fit of (w,h) into `maxSide` — the shared integer
    * dims contract for both the metadata-level mm43 check and the real
    * [[resizeBytes]]. Never upscales.
    */
  def resize(w: Int, h: Int, maxSide: Int): (Int, Int) = {
    val scale = math.min(1.0, maxSide.toDouble / math.max(w, h))
    (math.max(1, (w * scale).toInt), math.max(1, (h * scale).toInt))
  }

  /** REAL resize: decode → [[resize]] dims → nearest-neighbor Graphics2D
    * redraw → PNG re-encode. Nearest-neighbor samples only source pixels
    * (no edge blending with the uninitialized target background, no
    * fixed-point rounding drift), which keeps the resample deterministic and
    * makes the mm46 solid-color oracle exact. None for payloads the JDK
    * cannot decode.
    */
  def resizeBytes(payload: Array[Byte], maxSide: Int): Option[Array[Byte]] =
    decodeImage(payload).map { img =>
      val (rw, rh) = resize(img.getWidth, img.getHeight, maxSide)
      val out = new BufferedImage(rw, rh, BufferedImage.TYPE_INT_RGB)
      val g2 = out.createGraphics()
      try {
        g2.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
          RenderingHints.VALUE_INTERPOLATION_NEAREST_NEIGHBOR)
        g2.drawImage(img, 0, 0, rw, rh, null)
      } finally g2.dispose()
      val bos = new ByteArrayOutputStream()
      ImageIO.write(out, "png", bos)
      bos.toByteArray
    }

  /** STUB frame sampler: returns the byte offsets a real video demuxer
    * would seek to — every `stride`-th position, capped at `maxFrames`.
    */
  def sampleFrameOffsets(byteLen: Long, stride: Long, maxFrames: Int): Seq[Long] =
    (0L until byteLen by stride).take(maxFrames)

  /** Perceptual average-hash (aHash) over a decoded image: nearest-neighbor
    * subsample to an 8×8 grid (source pixel at (gx·w/8, gy·h/8), integer
    * division — no averaging, so every step is exact), integer luminance
    * per sample (the [[imageStats]] convention), bit k = gy·8+gx set iff
    * 64·lum(k) > Σlum (strictly — ties clear the bit; the scale-free
    * integer form of lum > mean). Returned as two non-negative 32-bit
    * halves (hi = bits 32-63, lo = bits 0-31) so SQL engines reproduce it
    * without signed-shift edge cases. Identical images always collide;
    * small brightness/scale edits land within a few bits — the standard
    * image near-dup fingerprint.
    */
  def aHash(img: BufferedImage): (Long, Long) = {
    val w = img.getWidth; val h = img.getHeight
    val lums = new Array[Long](64)
    var total = 0L
    var k = 0
    while (k < 64) {
      val gx = k % 8; val gy = k / 8
      val rgb = img.getRGB(gx * w / 8, gy * h / 8)
      val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
      val lum = (299L * r + 587L * g + 114L * b) / 1000L
      lums(k) = lum; total += lum
      k += 1
    }
    var hi = 0L; var lo = 0L
    k = 0
    while (k < 64) {
      if (64L * lums(k) > total) {
        if (k < 32) lo |= 1L << k else hi |= 1L << (k - 32)
      }
      k += 1
    }
    (hi, lo)
  }
}

object Multimodal {

  /** Hex md5 (matches DuckDB's `md5()` for oracle checks). */
  private def md5hex(b: Array[Byte]): String =
    MessageDigest.getInstance("MD5").digest(b).map("%02x".format(_)).mkString

  /** Attach a binary payload column to the `documents` fixture (the corpus
    * has no real media; UTF-8 text bytes stand in for the blob while keeping
    * the binary-typed schema).
    */
  def asMedia(docs: DataFrame): Dataset[MediaItem] = {
    import docs.sparkSession.implicits._
    docs.select(
      col("doc_id").cast("long").as("media_id"),
      lit("application/octet-stream").as("mime_type"),
      encode(col("text"), "UTF-8").as("payload"))
      .as[MediaItem]
  }

  /** Batched decode + feature extraction — the mapInPandas analog. Each
    * partition is processed in fixed-size buffers; one codec instance per
    * batch, never per row.
    */
  def extractFeatures(media: Dataset[MediaItem], batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch setup would open the codec once here
        batch.map { m =>
          val (w, h, feat) = MediaCodec.decode(m.payload)
          MediaFeatures(m.media_id, m.mime_type, m.payload.length.toLong,
            md5hex(m.payload), w, h, feat)
        }
      }
    }
  }
}
