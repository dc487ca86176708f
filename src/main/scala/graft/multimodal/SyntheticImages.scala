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
