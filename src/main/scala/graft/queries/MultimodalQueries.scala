package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

/** Multimodal plumbing exposed to the driver's oracle check: the binary
  * payload + batched mapPartitions feature extraction runs end-to-end, and
  * the DuckDB-computable columns (byte length, content md5) are
  * hash-compared; the stubbed decode outputs (width/height/embedding) are
  * exercised by MultimodalSpec instead.
  */
object MultimodalQueries extends QuerySet {

  def mm39(s: SparkSession, dir: String): DataFrame =
    Multimodal.extractFeatures(Multimodal.asMedia(Q.t(s, dir, "documents")))
      .toDF()
      .select(col("media_id"), col("byte_length"), col("content_md5"))

  /** Resize plumbing end-to-end: decode (stub dims — deterministic from the
    * first payload bytes, which the oracle recomputes) → MediaCodec.resize
    * aspect-preserving fit into 96px. The arithmetic (double scale, trunc)
    * is bit-identical in DuckDB, so the contract of the resize STEP is
    * oracle-verified even though real pixel scaling is stubbed.
    */
  def mm43(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Multimodal.extractFeatures(Multimodal.asMedia(Q.t(s, dir, "documents")))
      .map { f =>
        val (rw, rh) = graft.multimodal.MediaCodec.resize(f.width, f.height, 96)
        (f.media_id, f.width, f.height, rw, rh)
      }.toDF("media_id", "width", "height", "resized_w", "resized_h")
  }

  /** Frame-sampling plumbing: the offsets a demuxer would seek to (every
    * 100th byte, max 5 frames), exploded to one row per frame — the
    * batched flatMap shape a video pipeline fans frames out with.
    */
  def mm44(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Multimodal.asMedia(Q.t(s, dir, "documents"))
      .flatMap { m =>
        graft.multimodal.MediaCodec
          .sampleFrameOffsets(m.payload.length.toLong, 100L, 5)
          .map(o => (m.media_id, o))
      }.toDF("media_id", "frame_offset")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm39_media_features" -> (mm39 _),
    "mm43_media_resize" -> (mm43 _),
    "mm44_frame_offsets" -> (mm44 _))

  val oracles: Map[String, String] = Map(
    "mm39_media_features" ->
      """SELECT CAST(doc_id AS BIGINT) AS media_id,
        | CAST(strlen(text) AS BIGINT) AS byte_length,
        | md5(text) AS content_md5
        |FROM documents""".stripMargin,
    // stub dims: w = 64 + (payload[0] & 0x7f), h = 64 + (payload[1] & 0x7f);
    // fixture text is ASCII (spec-checked strlen == length), so the payload
    // bytes are the character codes
    "mm43_media_resize" ->
      """WITH d AS (SELECT CAST(doc_id AS BIGINT) AS media_id,
        |  64 + ascii(substr(text, 1, 1)) AS w,
        |  64 + ascii(substr(text, 2, 1)) AS h
        | FROM documents)
        |SELECT media_id, CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
        | CAST(greatest(1, trunc(w * least(1.0, 96.0 / greatest(w, h)))) AS INTEGER) AS resized_w,
        | CAST(greatest(1, trunc(h * least(1.0, 96.0 / greatest(w, h)))) AS INTEGER) AS resized_h
        |FROM d""".stripMargin,
    "mm44_frame_offsets" ->
      """SELECT CAST(doc_id AS BIGINT) AS media_id, CAST(o AS BIGINT) AS frame_offset
        |FROM documents CROSS JOIN generate_series(0, 400, 100) t(o)
        |WHERE o < strlen(text)""".stripMargin)
}
