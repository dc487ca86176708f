package graft.queries

import java.sql.{Date, Timestamp}
import java.time.LocalDateTime
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.x12._

/** Driver-visible X12 medallion queries. The corpus is generated
  * deterministically (seed 42) under the system temp dir on first use; the
  * driver's rows>0 check then exercises the full engine: wholetext scan →
  * distributed parse → typed silver → native-expression gold marts → 997
  * generation. No DuckDB oracle exists for X12 parsing, so these are
  * rows-only entries; ScalaTest (X12ParserSpec/X12PipelineSpec) carries the
  * semantic assertions.
  */
object X12Queries extends QuerySet {

  private val corpusDir =
    s"${System.getProperty("java.io.tmpdir")}/graft_x12_corpus_v1"

  private val date = Date.valueOf("2025-09-01")
  private val ts = Timestamp.valueOf("2025-09-01 12:00:00")
  private val now = LocalDateTime.of(2025, 9, 1, 12, 0, 0)

  // silver is parsed once per session and cached — the six x12_* queries
  // fan out from one shared scan (the same cache-once pattern Pipeline uses)
  @transient private var cachedSilver: Option[(SparkSession, org.apache.spark.sql.Dataset[SilverRecord])] = None

  private def silverDs(s: SparkSession): org.apache.spark.sql.Dataset[SilverRecord] =
    synchronized {
      cachedSilver match {
        case Some((sess, ds)) if sess eq s => ds
        case other =>
          // release blocks cached under a previous session before replacing
          other.foreach { case (_, old) =>
            try old.unpersist() catch { case _: Throwable => }
          }
          X12TestDataGen.writeCorpus(corpusDir, 45, seed = 42L)
          import s.implicits._
          val bronze = X12Bronze.ingest(s, corpusDir, "BATCH_Q", date)
          val valid = bronze.filter(org.apache.spark.sql.functions.col("file_is_valid"))
            .select("file_name", "content").as[(String, String)]
          val ds = X12Silver.parse(valid, "BATCH_Q", date, ts).cache()
          cachedSilver = Some((s, ds))
          ds
      }
    }

  private def silver(s: SparkSession): DataFrame = silverDs(s).toDF()

  /** Gold marts consume only valid transactions, like the reference
    * (gold_x12_analytics.py:74) and X12Pipeline.run.
    */
  private def silverValid(s: SparkSession): DataFrame =
    silver(s).filter(org.apache.spark.sql.functions.col("is_valid"))

  def x12Silver(s: SparkSession, dir: String): DataFrame =
    X12Silver.referenceView(silverDs(s))

  def x12Bronze(s: SparkSession, dir: String): DataFrame = {
    X12TestDataGen.writeCorpus(corpusDir, 45, seed = 42L)
    X12Bronze.ingest(s, corpusDir, "BATCH_Q", date)
      .drop("content")
  }

  def x12ClaimMart(s: SparkSession, dir: String): DataFrame =
    X12Gold.claimAnalytics(silverValid(s))

  def x12PartnerMart(s: SparkSession, dir: String): DataFrame =
    X12Gold.tradingPartnerAnalytics(silverValid(s))

  def x12QualityMart(s: SparkSession, dir: String): DataFrame =
    X12Gold.dataQualityMetrics(silverValid(s))

  def x12Acks(s: SparkSession, dir: String): DataFrame =
    Ack997.validate997(Ack997.acknowledgments(silver(s), "BATCH_Q", now))
      .drop("processed_files")

  /** J3: request/response trace correlation over the generated pairs. */
  def x12Pairs(s: SparkSession, dir: String): DataFrame =
    X12Gold.requestResponsePairs(silverValid(s))

  /** S13 (ref: src/sftp/manager.py:217-231): remote-file eligibility —
    * age/size predicates over file metadata, no content read (the scan
    * projects only `_metadata`).
    */
  def x12FileEligibility(s: SparkSession, dir: String): DataFrame = {
    X12TestDataGen.writeCorpus(corpusDir, 45, seed = 42L)
    import org.apache.spark.sql.functions._
    s.read.format("text").option("wholetext", "true")
      .option("pathGlobFilter", "*.x12").load(corpusDir)
      .select(col("_metadata.file_name").as("file_name"),
        col("_metadata.file_size").as("file_size"),
        col("_metadata.file_modification_time").as("mtime"))
      .filter(col("file_size") <= 100L * 1024 * 1024 &&
        col("mtime") >= lit("2020-01-01").cast("timestamp"))
  }

  /** A7/F8: the reference's v_daily_processing_summary via spark.sql. */
  def x12DailySummary(s: SparkSession, dir: String): DataFrame =
    X12Views.dailyProcessingSummary(s, silver(s), date)

  /** A8/O1: v_transaction_type_breakdown via spark.sql. */
  def x12TypeBreakdown(s: SparkSession, dir: String): DataFrame =
    X12Views.transactionTypeBreakdown(s, silver(s))

  /** J1/X19: v_recent_processing_activity — bronze↔silver left join. */
  def x12RecentActivity(s: SparkSession, dir: String): DataFrame =
    X12Views.recentProcessingActivity(x12Bronze(s, dir), silver(s),
      Timestamp.valueOf("2025-08-25 00:00:00"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x12_60_bronze_validate" -> (x12Bronze _),
    "x12_61_silver_parse" -> (x12Silver _),
    "x12_62_gold_claims" -> (x12ClaimMart _),
    "x12_63_gold_partners" -> (x12PartnerMart _),
    "x12_64_gold_quality" -> (x12QualityMart _),
    "x12_65_ack997" -> (x12Acks _),
    "x12_66_request_response_pairs" -> (x12Pairs _),
    "x12_67_file_eligibility" -> (x12FileEligibility _),
    "x12_68_daily_summary_view" -> (x12DailySummary _),
    "x12_69_type_breakdown_view" -> (x12TypeBreakdown _),
    "x12_70_recent_activity_view" -> (x12RecentActivity _))

  val oracles: Map[String, String] = Map.empty
}
