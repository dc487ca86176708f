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
  /** STUB — stands in for a real image/audio decoder (not installed here).
    * Deterministic on the payload bytes so tests and the DuckDB oracle can
    * verify the surrounding plumbing: "dimensions" are derived from the
    * first payload bytes and the "embedding" from a rolling byte hash.
    */
  def decode(payload: Array[Byte]): (Int, Int, Array[Float]) = {
    val w = 64 + (if (payload.nonEmpty) (payload(0) & 0x7f) else 0)
    val h = 64 + (if (payload.length > 1) (payload(1) & 0x7f) else 0)
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
