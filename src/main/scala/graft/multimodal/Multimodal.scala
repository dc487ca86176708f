package graft.multimodal

import java.security.MessageDigest
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
  * The actual codecs are NOT in this container, so [[MediaCodec.decode]] is
  * a clearly-marked deterministic stub; everything around it — schema,
  * batching, partitioning, null handling — is real and tested.
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

  /** Decode: dimensions are REAL for recognized image headers
    * ([[sniffDimensions]]); unrecognized payloads fall back to the
    * deterministic stub (derived from the first payload bytes), and the
    * "embedding" remains a clearly-marked rolling-byte-hash STUB — a real
    * pixel decoder/featurizer is not installed in this environment. The
    * batching, schema and null contracts around this call are real.
    */
  def decode(payload: Array[Byte]): (Int, Int, Array[Float]) = {
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

  /** STUB resize: a real implementation re-encodes pixels; the stub scales
    * the fake dimensions, preserving the contract (w,h) => (w',h').
    */
  def resize(w: Int, h: Int, maxSide: Int): (Int, Int) = {
    val scale = math.min(1.0, maxSide.toDouble / math.max(w, h))
    (math.max(1, (w * scale).toInt), math.max(1, (h * scale).toInt))
  }

  /** STUB frame sampler: returns the byte offsets a real video demuxer
    * would seek to — every `stride`-th position, capped at `maxFrames`.
    */
  def sampleFrameOffsets(byteLen: Long, stride: Long, maxFrames: Int): Seq[Long] =
    (0L until byteLen by stride).take(maxFrames)
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
