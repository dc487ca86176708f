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
}
