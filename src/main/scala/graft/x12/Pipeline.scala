package graft.x12

import java.time.LocalDateTime
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end medallion run: bronze → silver → gold → 997 acks.
  *
  * Replaces the reference's DAG-of-notebooks orchestration
  * (local-development/airflow/dags/x12_processing_dag.py:311:
  * `create_dirs >> check_files >> bronze >> silver >> gold >> cleanup`) with
  * one in-process runner. Differences that matter at scale:
  *  - silver is parsed once, cached, and fanned out to all eleven marts —
  *    the reference re-reads and re-`count()`s the silver table per mart
  *    (SURVEY.md §3.1 step 4);
  *  - only files bronze marked valid reach the parser;
  *  - acknowledgments never collect() to the driver.
  */
object X12Pipeline {

  final case class Result(
      bronze: DataFrame,
      silver: Dataset[SilverRecord],
      marts: Map[String, DataFrame],
      acks: DataFrame)

  def run(
      spark: SparkSession,
      landingDir: String,
      outDir: String,
      batchId: String,
      processingDate: java.sql.Date,
      processingTs: java.sql.Timestamp,
      now: LocalDateTime,
      write: Boolean = true,
      qualityDrivenAckCode: Boolean = false): Result = {
    import spark.implicits._

    // Bronze: validate + metadata; landing write partitioned by y/m/d
    val bronze = X12Bronze.ingest(spark, landingDir, batchId, processingDate)
    bronze.cache()
    if (write) {
      X12Bronze.writeLanding(bronze, s"$outDir/bronze")
      X12Bronze.writeMetadataJson(bronze, s"$outDir/bronze_metadata")
      X12Bronze.summary(bronze).write.mode("overwrite").json(s"$outDir/bronze_summary")
      // dead-letter: invalid files quarantined with their errors, never
      // silently dropped (the reference only logs them)
      bronze.filter(!col("file_is_valid"))
        .select("file_name", "batch_id", "validation_errors", "content")
        .write.mode("overwrite").json(s"$outDir/bronze_quarantine")
    }

    // Silver: parse only bronze-valid files (F-gate before the flatMap)
    val validFiles = bronze.filter(col("file_is_valid"))
      .select(col("file_name"), col("content")).as[(String, String)]
    val silver = X12Silver.parse(validFiles, batchId, processingDate, processingTs)
    silver.cache()
    if (write) {
      X12Silver.write(silver, s"$outDir/silver")
      X12Silver.summary(silver).write.mode("overwrite").json(s"$outDir/silver_summary")
    }

    // Gold: valid transactions only (gold_x12_analytics.py:74), one shared
    // cached scan fanned out to all marts
    val silverValid = silver.toDF().filter(col("is_valid"))
    val marts = X12Gold.allMarts(silverValid, processingDate) +
      ("gold_daily_analytics" ->
        X12Gold.dailyAnalytics(bronze, silver.toDF(), processingDate))
    val unpartitioned = Set("gold_business_kpis", "gold_daily_analytics")
    if (write) marts.foreach { case (name, df) =>
      val w = df.write.mode("overwrite")
      // summary marts keyed by processing_date partition like the reference
      // (gold_x12_analytics.py:500 etc.); single-row globals unpartitioned
      if (!unpartitioned(name))
        w.partitionBy("processing_date").parquet(s"$outDir/$name")
      else w.parquet(s"$outDir/$name")
    }

    // 997 acknowledgments per trading partner
    val acks = Ack997.validate997(
      Ack997.acknowledgments(silver.toDF(), batchId, now, qualityDrivenAckCode))
    if (write) {
      Ack997.writeAckFiles(acks, s"$outDir/acknowledgments")
      Ack997.metadata(acks).write.mode("overwrite").json(s"$outDir/acknowledgment_metadata")
    }

    Result(bronze, silver, marts, acks)
  }
}
