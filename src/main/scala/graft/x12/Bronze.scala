package graft.x12

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Bronze metadata extracted per file (bronze_x12_ingestion.py:63-146).
  * Keeps the reference's quirks: the segment terminator is sniffed as the
  * character before the first newline (single-line files therefore report no
  * terminator and segment_count 0), and ISA fields index into the
  * first-line split where position 0 is the "ISA" tag itself.
  */
final case class BronzeIsaInfo(
    authorization_info: Option[String],
    sender_id: Option[String],
    receiver_id: Option[String],
    interchange_date: Option[String],
    interchange_time: Option[String],
    control_number: Option[String])

final case class BronzeGsInfo(
    functional_id_code: Option[String],
    application_sender: Option[String],
    application_receiver: Option[String],
    date: Option[String],
    time: Option[String],
    group_control_number: Option[String])

final case class BronzeStInfo(
    transaction_set_id: Option[String],
    control_number: Option[String])

final case class BronzeMetadata(
    file_size: Long,
    line_count: Long,
    element_separator: Option[String],
    segment_terminator: Option[String],
    segment_count: Long,
    interchange_control_header: Option[BronzeIsaInfo],
    functional_group_header: Option[BronzeGsInfo],
    transaction_set_header: Option[BronzeStInfo])

/** Bronze layer: raw-file validation + metadata + partitioned landing.
  *
  * Validation (P18) is pure column expressions — whole-stage-codegen'd, no
  * UDF; metadata sniffing (P17) is a typed map because the element separator
  * is data-dependent (content[3] decides how the rest of the line splits).
  */
object X12Bronze {

  /** P18 file validator (bronze_x12_ingestion.py:150-198) as native
    * boolean/array expressions over a (file_name, content) frame.
    */
  def validate(files: DataFrame): DataFrame = {
    val c = col("content")
    val errors = array_compact(array(
      when(!c.startsWith("ISA"), lit("File does not start with ISA segment")),
      when(length(c) < 100, lit("File too small to be valid X12")),
      when(!c.contains("ISA"), lit("Missing required segment: ISA")),
      when(!c.contains("GS"), lit("Missing required segment: GS")),
      when(!c.contains("ST"), lit("Missing required segment: ST"))))
    val warnings = array_compact(array(
      when(size(split(c, "~")) - 1 < 3, lit("Unusual number of segment terminators")),
      when(!c.rlike("^[\\x00-\\x7F]*$"), lit("File contains non-ASCII characters"))))
    files
      .withColumn("validation_errors", errors)
      .withColumn("validation_warnings", warnings)
      .withColumn("file_is_valid", size(errors) === 0)
  }

  /** P17 metadata extractor (bronze_x12_ingestion.py:63-146), pure Scala. */
  def extractMetadata(content: String): BronzeMetadata = {
    def opt(parts: Array[String], i: Int): Option[String] =
      if (i < parts.length) Some(parts(i)) else None
    // separator/terminator sniffing happens ONLY for ISA-led files, like
    // the reference (bronze_x12_ingestion.py:86-98 sits inside the
    // startswith('ISA') branch) — a non-X12 multiline file must not have a
    // newline-adjacent character mistaken for a terminator
    val isIsa = content.startsWith("ISA")
    val sep: Option[String] =
      if (isIsa && content.length > 3) Some(content.charAt(3).toString)
      else None
    val nl = content.indexOf('\n')
    val term: Option[String] =
      if (isIsa && nl > 0 && content.charAt(nl - 1) != '\r' && content.charAt(nl - 1) != '\n')
        Some(content.charAt(nl - 1).toString)
      else None
    val segCount = term.map(t => content.count(_ == t.head).toLong).getOrElse(0L)
    val isaInfo = sep.flatMap { s =>
      val parts = content.split('\n')(0).split(java.util.regex.Pattern.quote(s), -1)
      if (parts.length >= 16)
        Some(BronzeIsaInfo(opt(parts, 1), opt(parts, 6), opt(parts, 8),
          opt(parts, 9), opt(parts, 10), opt(parts, 13)))
      else None
    }
    def sniff(tag: String, minLen: Int): Option[Array[String]] = {
      val s = sep.getOrElse("*")
      val t = term.getOrElse("~")
      val start = content.indexOf(tag + s)
      if (start < 0) None
      else {
        val end = content.indexOf(t, start)
        if (end <= start) None
        else {
          val parts = content.substring(start, end).split(java.util.regex.Pattern.quote(s), -1)
          if (parts.length >= minLen) Some(parts) else None
        }
      }
    }
    val gsInfo = sniff("GS", 8).map(p => BronzeGsInfo(
      opt(p, 1), opt(p, 2), opt(p, 3), opt(p, 4), opt(p, 5), opt(p, 6)))
    val stInfo = sniff("ST", 3).map(p => BronzeStInfo(opt(p, 1), opt(p, 2)))
    BronzeMetadata(content.length.toLong, content.count(_ == '\n').toLong,
      sep, term, segCount, isaInfo, gsInfo, stInfo)
  }

  /** Full bronze ingest: read landing dir → validate → metadata → one frame
    * with file content + audit columns, ready for the partitioned landing
    * write (S3) and JSON sidecar (S4).
    */
  def ingest(spark: SparkSession, landingDir: String, batchId: String,
      processingDate: java.sql.Date): DataFrame = {
    import spark.implicits._
    val files = X12Silver.readFiles(spark, landingDir).toDF("file_name", "content")
    val withMeta = files
      .as[(String, String)]
      .map { case (name, content) => (name, content, extractMetadata(content)) }
      .toDF("file_name", "content", "metadata")
    validate(withMeta)
      .withColumn("batch_id", lit(batchId))
      .withColumn("processing_date", lit(processingDate))
      .withColumn("year", year(col("processing_date")))
      .withColumn("month", month(col("processing_date")))
      .withColumn("day", dayofmonth(col("processing_date")))
  }

  /** S3: date-partitioned landing write (bronze_x12_ingestion.py:259-262
    * copies into year=/month=/day=; partitionBy gives the same layout).
    */
  def writeLanding(bronze: DataFrame, path: String): Unit =
    bronze.write.mode("append").partitionBy("year", "month", "day").parquet(path)

  /** S4: metadata JSON sidecars + batch summary JSON
    * (bronze_x12_ingestion.py:265-266,304-305).
    */
  def writeMetadataJson(bronze: DataFrame, path: String): Unit =
    bronze.select("file_name", "batch_id", "file_is_valid",
      "validation_errors", "validation_warnings", "metadata")
      .write.mode("overwrite").json(path)

  /** Batch summary (bronze_x12_ingestion.py:294-305) as one aggregate. */
  def summary(bronze: DataFrame): DataFrame =
    bronze.groupBy("batch_id", "processing_date")
      .agg(
        count(lit(1)).as("files_found"),
        sum(when(col("file_is_valid"), 1).otherwise(0)).as("files_valid"),
        sum(when(!col("file_is_valid"), 1).otherwise(0)).as("files_invalid"),
        sum(col("metadata.file_size")).as("total_bytes"))
}
