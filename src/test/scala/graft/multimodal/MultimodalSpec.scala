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

  test("stub codec contracts: resize bounds and frame sampling") {
    assert(MediaCodec.resize(1920, 1080, 512) == (512, 288))
    assert(MediaCodec.resize(100, 50, 512) == (100, 50))
    val offs = MediaCodec.sampleFrameOffsets(1000, 300, 10)
    assert(offs == Seq(0L, 300L, 600L, 900L))
    assert(MediaCodec.sampleFrameOffsets(100000, 1, 5).length == 5)
  }
}
