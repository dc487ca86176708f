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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm39_media_features" -> (mm39 _))

  val oracles: Map[String, String] = Map(
    "mm39_media_features" ->
      """SELECT CAST(doc_id AS BIGINT) AS media_id,
        | CAST(strlen(text) AS BIGINT) AS byte_length,
        | md5(text) AS content_md5
        |FROM documents""".stripMargin)
}
