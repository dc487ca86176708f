package graft.x12

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's Postgres monitoring views
  * (local-development/sql/init.sql:149-186) served as Spark SQL over the
  * engine's bronze/silver frames — the §3.3 dashboard entry point: register
  * temp views, run `spark.sql`, same shapes the portal queries.
  */
object X12Views {

  /** v_daily_processing_summary (init.sql:149-160): per-date quality
    * histogram. The reference filters to the current date; the date is a
    * parameter here so views are testable (F8's `::date = CURRENT_DATE`
    * maps to a pushed-down date predicate).
    */
  def dailyProcessingSummary(spark: SparkSession, silver: DataFrame,
      onDate: java.sql.Date): DataFrame = {
    silver.createOrReplaceTempView("silver_x12_transactions")
    spark.sql(
      s"""SELECT processing_date,
         |  COUNT(*) AS total_files,
         |  AVG(quality_score) AS avg_quality_score,
         |  COUNT(CASE WHEN quality_score > 80 THEN 1 END) AS high_quality_files,
         |  COUNT(CASE WHEN quality_score BETWEEN 50 AND 80 THEN 1 END) AS medium_quality_files,
         |  COUNT(CASE WHEN quality_score < 50 THEN 1 END) AS low_quality_files
         |FROM silver_x12_transactions
         |WHERE CAST(processing_timestamp AS DATE) = DATE'$onDate'
         |GROUP BY processing_date""".stripMargin)
  }

  /** v_transaction_type_breakdown (init.sql:162-172): A8 — per-type rollup
    * ordered by volume.
    */
  def transactionTypeBreakdown(spark: SparkSession, silver: DataFrame): DataFrame = {
    silver.createOrReplaceTempView("silver_x12_transactions")
    spark.sql(
      """SELECT transaction_type,
        |  COUNT(*) AS file_count,
        |  AVG(quality_score) AS avg_quality_score,
        |  MIN(processing_timestamp) AS first_processed,
        |  MAX(processing_timestamp) AS last_processed
        |FROM silver_x12_transactions
        |GROUP BY transaction_type
        |ORDER BY file_count DESC""".stripMargin)
  }

  /** v_recent_processing_activity (init.sql:174-186): J1 — bronze↔silver
    * LEFT OUTER equi-join on file name plus the derived processing duration
    * (`EXTRACT(EPOCH FROM (s.ts - b.ts))` → unix_timestamp difference).
    * Unmatched bronze files (invalid/unparsed) survive with null silver
    * columns, exactly the reference's left-join semantics.
    */
  def recentProcessingActivity(bronze: DataFrame, silver: DataFrame,
      cutoff: java.sql.Timestamp): DataFrame = {
    val b = bronze.select(
      col("file_name").as("filename"),
      col("metadata.file_size").as("file_size"),
      col("processing_date"),
      // bronze frame carries the batch date; the landing timestamp stands in
      col("processing_date").cast("timestamp").as("bronze_timestamp"))
    val s = silver.select(
      col("file_name").as("s_filename"),
      col("transaction_type"), col("quality_score"),
      col("processing_timestamp").as("silver_timestamp"))
    b.join(s, b("filename") === s("s_filename"), "left")
      .filter(col("bronze_timestamp") >= cutoff)
      .withColumn("processing_duration_seconds",
        unix_timestamp(col("silver_timestamp")) - unix_timestamp(col("bronze_timestamp")))
      .drop("s_filename")
      .orderBy(col("bronze_timestamp").desc, col("filename"))
  }
}
