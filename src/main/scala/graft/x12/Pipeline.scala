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
  *  - acknowledgments never collect() to the driver;
  *  - a processed-file ledger replaces the reference's archive-move
  *    (x12_processing_dag.py:250-270): the DAG physically moves files to
  *    `archive/` after each run so a re-run sees an empty landing dir. A
  *    distributed engine cannot assume it owns the landing dir (SFTP
  *    contract: the fetcher may land new files mid-run), so the batch
  *    runner writes `_processed_files` parquet under outDir and anti-joins
  *    it on the next run — re-running over the same landing dir appends no
  *    duplicate silver rows. The streaming path gets the same guarantee
  *    from checkpointed file tracking (Streaming.scala).
  */
object X12Pipeline {

  final case class Result(
      bronze: DataFrame,
      silver: Dataset[SilverRecord],
      marts: Map[String, DataFrame],
      acks: DataFrame)

  private def ledgerPath(outDir: String): String = s"$outDir/_processed_files"

  /** File names already processed into `outDir` by previous runs (empty
    * frame when no ledger exists yet).
    */
  def processedFiles(spark: SparkSession, outDir: String): DataFrame = {
    import spark.implicits._
    val path = ledgerPath(outDir)
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a crashed append can leave a footer-less dir; an unreadable ledger
    // must mean "re-process" (the documented crash contract), never a
    // permanently wedged pipeline
    if (!fs.exists(hp)) Seq.empty[String].toDF("file_name")
    else
      try spark.read.parquet(path).select("file_name")
      catch { case scala.util.control.NonFatal(_) =>
        // schema-less dir OR corrupt footer — any unreadable ledger means
        // re-process, never a wedged pipeline
        Seq.empty[String].toDF("file_name")
      }
  }

  def run(
      spark: SparkSession,
      landingDir: String,
      outDir: String,
      batchId: String,
      processingDate: java.sql.Date,
      processingTs: java.sql.Timestamp,
      now: LocalDateTime,
      write: Boolean = true,
      qualityDrivenAckCode: Boolean = false,
      incrementalGold: Boolean = false): Result = {
    import spark.implicits._

    // Bronze: validate + metadata; landing write partitioned by y/m/d.
    // Already-ledgered files are dropped up front (anti-join on the
    // file-name ledger), so a re-run is incremental, not a dup.
    // The ledger is SNAPSHOTTED via eager localCheckpoint before the run:
    // the run itself appends to the ledger at the end, and a plan that
    // read the ledger path directly would be re-cached against the grown
    // ledger (Spark's recacheByPath refreshes caches on writes to a source
    // path), anti-joining this run's own files away from the returned
    // frames. The checkpoint truncates the plan to a materialized RDD with
    // no file-source node — immune to the path refresh — WITHOUT pulling
    // the ledger to the driver (a collect here grows unboundedly with the
    // processed-file history; the checkpoint stays executor-side). AQE
    // broadcasts the anti-join when the snapshot fits the threshold.
    val ingested = X12Bronze.ingest(spark, landingDir, batchId, processingDate)
    val bronze =
      if (write) {
        val processed = processedFiles(spark, outDir).localCheckpoint(true)
        ingested.join(processed, Seq("file_name"), "left_anti")
      } else ingested
    bronze.cache()
    // a fully-ledgered re-run has nothing new: skip every write (the
    // overwrite-mode mart sinks would otherwise be wiped with empty frames)
    val doWrite = write && bronze.count() > 0
    if (doWrite) {
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
    if (doWrite) {
      X12Silver.write(silver, s"$outDir/silver")
      X12Silver.summary(silver).write.mode("overwrite").json(s"$outDir/silver_summary")
    }

    // Gold: valid transactions only (gold_x12_analytics.py:74). On an
    // incremental (ledgered) run the marts must aggregate the FULL
    // accumulated silver store, not just this run's slice — the reference
    // reads the whole silver table per DAG run, and the overwrite-mode
    // mart sinks would otherwise replace history with the latest batch's
    // numbers. Batch-scoped outputs (summaries, quarantine, 997 acks,
    // daily analytics over this batch's bronze) stay per-run by design.
    // the read-back can fail on a store with no parquet footers yet (this
    // run's silver slice was empty — e.g. every landing file failed bronze
    // validation); fall back to the in-memory slice so the run completes
    val silverStore =
      if (doWrite)
        try spark.read.parquet(s"$outDir/silver")
        catch { case scala.util.control.NonFatal(_) => silver.toDF() }
      else silver.toDF()
    val silverValid = silverStore.filter(col("is_valid"))
    val unpartitioned = Set("gold_business_kpis", "gold_daily_analytics")
    // Marts whose rows are NOT a function of a single processing_date:
    // request/response correlation joins a request to a response that may
    // have arrived in a LATER batch (the response side deliberately drops
    // its own date) — a date-scoped recompute would never revisit the
    // request's partition and the pair would be lost forever. These marts
    // always aggregate the full store; their pair sets only grow, so a
    // full-input dynamic overwrite rewrites every partition they own.
    val crossDate = Set("gold_request_response_pairs")
    // Incremental gold maintenance (A9's group-recompute semantics at
    // pipeline level): the per-date marts group by processing_date, so
    // rows of one date only ever influence that date's partition. An
    // incremental run therefore recomputes ONLY the partitions this batch
    // touched — the mart input is the accumulated store filtered to the
    // touched dates (a partition-pruned scan), and the write replaces just
    // those partitions via dynamic partition overwrite. At 100 TB this
    // turns mart maintenance from O(history) into O(day). Global
    // single-row marts (KPIs) still aggregate the full store — they are
    // cheap aggregates, and a date-scoped recompute would drop history.
    val fullMarts = X12Gold.allMarts(silverValid, processingDate) +
      ("gold_daily_analytics" ->
        X12Gold.dailyAnalytics(bronze, silver.toDF(), processingDate))
    val marts =
      if (!incrementalGold) fullMarts
      else {
        val touched = X12Gold.allMarts(
          silverValid.filter(col("processing_date") === lit(processingDate)),
          processingDate)
        fullMarts.map { case (name, df) =>
          name -> (if (unpartitioned(name) || crossDate(name)) df
            else touched(name))
        }
      }
    if (doWrite) {
      val overwriteMode = "spark.sql.sources.partitionOverwriteMode"
      val prevMode = spark.conf.get(overwriteMode)
      if (incrementalGold) spark.conf.set(overwriteMode, "dynamic")
      try marts.foreach { case (name, df) =>
        val w = df.write.mode("overwrite")
        // summary marts keyed by processing_date partition like the reference
        // (gold_x12_analytics.py:500 etc.); single-row globals unpartitioned
        if (!unpartitioned(name))
          w.partitionBy("processing_date").parquet(s"$outDir/$name")
        else w.parquet(s"$outDir/$name")
      } finally if (incrementalGold) spark.conf.set(overwriteMode, prevMode)
    }

    // 997 acknowledgments per trading partner
    val acks = Ack997.validate997(
      Ack997.acknowledgments(silver.toDF(), batchId, now, qualityDrivenAckCode))
    if (doWrite) {
      Ack997.writeAckFiles(acks, s"$outDir/acknowledgments")
      Ack997.metadata(acks).write.mode("overwrite").json(s"$outDir/acknowledgment_metadata")
      // ledger last: a file is "processed" only once every sink above has
      // been written (a crashed run re-processes, never skips)
      bronze.select("file_name")
        .withColumn("batch_id", lit(batchId))
        .withColumn("processed_at", lit(processingTs))
        .write.mode("append").parquet(ledgerPath(outDir))
    }

    Result(bronze, silver, marts, acks)
  }
}
