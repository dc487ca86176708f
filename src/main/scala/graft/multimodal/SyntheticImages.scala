package graft.multimodal

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

/** Deterministic image fixtures for specs and driver oracles.
  *
  * Pixel values are pure integer functions of (id, x, y), so a SQL oracle
  * can recompute the expected decode statistics from the formula alone — no
  * image library on the oracle side. The PNG encode → `ImageIO` decode
  * round-trip (lossless for 8-bit RGB) is then exactly the thing under test:
  * if [[MediaCodec.decode]]'s real pixel path is wrong, the stats diverge.
  */
object SyntheticImages {

  /** Gradient pixel formula — mirrored verbatim in the mm45 DuckDB oracle. */
  def gradientRgb(id: Long, x: Int, y: Int): Int = {
    val r = ((x * 7 + y * 13 + id * 31) % 256).toInt
    val g = ((x * 11 + y * 3 + id * 17) % 256).toInt
    val b = ((x * 5 + y * 19 + id * 7) % 256).toInt
    (r << 16) | (g << 8) | b
  }

  private def encodePng(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  def gradientPng(id: Long, w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, gradientRgb(id, x, y)); x += 1 }
      y += 1
    }
    encodePng(img)
  }

  def solidPng(r: Int, g: Int, b: Int, w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val rgb = (r << 16) | (g << 8) | b
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    encodePng(img)
  }

  /** Deterministic luma formula for synthetic raw video — mirrored
    * verbatim in the mm50 DuckDB oracle: Y-plane byte value is a pure
    * integer function of (id, frame, x, y).
    */
  def lumaByte(id: Long, frame: Int, x: Int, y: Int): Int =
    ((x * 7 + y * 13 + frame * 3 + id * 31) % 256).toInt

  /** A real YUV4MPEG2 (Y4M) raw-video container around formula planes:
    * the plain-text stream header, then `FRAME\n` + planar C420 YUV per
    * frame — what [[MediaCodec.decodeY4m]] must parse back exactly.
    * Chroma planes are formula-filled too (a parser that mis-sizes them
    * loses frame alignment and fails loud).
    */
  def y4m(id: Long, w: Int, h: Int, nFrames: Int): Array[Byte] = {
    require(w % 2 == 0 && h % 2 == 0, "C420 needs even dimensions")
    val header = s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C420jpeg\n"
      .getBytes("US-ASCII")
    val frameHdr = "FRAME\n".getBytes("US-ASCII")
    val ySize = w * h
    val cSize = (w / 2) * (h / 2)
    val out = java.nio.ByteBuffer.allocate(
      header.length + nFrames * (frameHdr.length + ySize + 2 * cSize))
    out.put(header)
    var f = 0
    while (f < nFrames) {
      out.put(frameHdr)
      var yy = 0
      while (yy < h) {
        var x = 0
        while (x < w) { out.put(lumaByte(id, f, x, yy).toByte); x += 1 }
        yy += 1
      }
      var c = 0
      while (c < 2 * cSize) { out.put(((f * 11 + c * 5 + id) % 256).toByte); c += 1 }
      f += 1
    }
    out.array()
  }

  /** Deterministic PCM sample formula — mirrored verbatim in the mm49
    * DuckDB oracle (the image-gradient idiom applied to audio): sample
    * value is a pure integer function of (id, channel, frame).
    */
  def pcmSample(id: Long, ch: Int, frame: Long): Int =
    (((frame * 31 + ch * 7 + id * 17) % 65536) - 32768).toInt

  /** A real little-endian 16-bit PCM WAV container around the formula
    * samples: RIFF/WAVE + `fmt ` + `data`, frames interleaved by channel —
    * what [[MediaCodec.decodeWav]] must parse back exactly.
    */
  /** Synthetic MPEG-1 Layer III stream — every frame header a pure
    * integer function of (id, frame index), frame bodies zero-filled
    * (the walker never reads them): per-frame bitrate index
    * `1 + (id·7 + f·3) mod 14` (a deterministic VBR pattern), padding
    * bit `(id + f) mod 2`, sample-rate index `id mod 3`, mono when
    * `id mod 4 == 0`. ids divisible by 5 carry a leading ID3v2 tag of
    * `id mod 37` body bytes; ids divisible by 6 a trailing 128-byte
    * ID3v1 block — both must be skipped by the walker. The mm52 oracle
    * recomputes every expected stat from these formulas.
    */
  def mp3Stream(id: Long, nFrames: Int): Array[Byte] = {
    val kbpsTable =
      Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
    val rates = Array(44100, 48000, 32000)
    val srIdx = (id % 3).toInt
    val rate = rates(srIdx)
    val mono = id % 4 == 0
    val out = new java.io.ByteArrayOutputStream()
    if (id % 5 == 0) {
      val tagLen = (id % 37).toInt
      out.write(Array[Byte]('I', 'D', '3', 4, 0, 0))
      out.write(Array[Byte](((tagLen >> 21) & 0x7F).toByte,
        ((tagLen >> 14) & 0x7F).toByte, ((tagLen >> 7) & 0x7F).toByte,
        (tagLen & 0x7F).toByte))
      out.write(new Array[Byte](tagLen))
    }
    var f = 0
    while (f < nFrames) {
      val brIdx = (1 + (id * 7 + f * 3) % 14).toInt
      val pad = ((id + f) % 2).toInt
      val frameLen = 144000 * kbpsTable(brIdx) / rate + pad
      val frame = new Array[Byte](frameLen)
      frame(0) = 0xFF.toByte
      frame(1) = 0xFB.toByte // MPEG-1, Layer III, no CRC
      frame(2) = ((brIdx << 4) | (srIdx << 2) | (pad << 1)).toByte
      frame(3) = (if (mono) 0xC0 else 0x00).toByte
      out.write(frame)
      f += 1
    }
    if (id % 6 == 0) {
      val tag = new Array[Byte](128)
      tag(0) = 'T'; tag(1) = 'A'; tag(2) = 'G'
      out.write(tag)
    }
    out.toByteArray
  }

  /** Synthetic H.264 Annex-B elementary stream: `4 + id mod 6` NAL units
    * — unit 0 an SPS (type 7), unit 1 a PPS (8), every u ≡ 2 (mod 5) an
    * IDR slice (5), the rest non-IDR slices (1); payload length
    * `10 + (id·3 + u·7) mod 50` bytes of 0xAA (never 0x00, so no
    * accidental start codes); the first start code 4-byte, the rest
    * 3-byte (both legal, both must be recognized). The mm53 oracle
    * recomputes the census from these formulas.
    */
  def h264Stream(id: Long, nUnits: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var u = 0
    while (u < nUnits) {
      out.write(if (u == 0) Array[Byte](0, 0, 0, 1) else Array[Byte](0, 0, 1))
      val tpe = if (u == 0) 7 else if (u == 1) 8 else if (u % 5 == 2) 5 else 1
      val refIdc = if (tpe == 1) 1 else 3
      out.write((refIdc << 5) | tpe)
      val payloadLen = (10 + (id * 3 + u * 7) % 50).toInt
      val payload = new Array[Byte](payloadLen)
      java.util.Arrays.fill(payload, 0xAA.toByte)
      out.write(payload)
      u += 1
    }
    out.toByteArray
  }

  def pcmWav(id: Long, sampleRate: Int, channels: Int,
      nFrames: Int): Array[Byte] = {
    val dataLen = nFrames * channels * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * channels * 2) // byte rate
      .putShort((channels * 2).toShort)  // block align
      .putShort(16)                      // bits per sample
    out.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var f = 0
    while (f < nFrames) {
      var c = 0
      while (c < channels) {
        out.putShort(pcmSample(id, c, f).toShort)
        c += 1
      }
      f += 1
    }
    out.array()
  }
}
