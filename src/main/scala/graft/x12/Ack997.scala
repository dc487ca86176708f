package graft.x12

import java.time.LocalDateTime
import java.time.format.DateTimeFormatter
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 997 Functional Acknowledgment generation
  * (reference: notebooks/generate_x12_acknowledgments.py:74-186).
  *
  * The 997 builder is a pure function (trivially unit-testable) wrapped in a
  * Scala UDF — string formatting is the one place SURVEY §2.11 keeps a UDF.
  * The file write is the scale-path fix for the reference's driver
  * `collect()` loop (generate_x12_acknowledgments.py:226-246): partitioning
  * the frame by partner and writing a partitioned text sink emits one
  * directory per partner with zero driver materialization.
  */
object Ack997 {

  /** Build one 997 interchange (generate_x12_acknowledgments.py:74-142).
    * Sender/receiver swap roles; ids are left-padded to 15 inside ISA.
    * The clock is a parameter (the reference calls datetime.now() inline)
    * so outputs are reproducible.
    */
  def generate997(
      senderId: String,
      receiverId: String,
      functionalGroupControlNumber: String,
      transactionSetControlNumbers: Seq[String],
      ackCode: String,
      now: LocalDateTime): String = {
    val time = now.format(DateTimeFormatter.ofPattern("HHmm"))
    val dateShort = now.format(DateTimeFormatter.ofPattern("yyMMdd"))
    val dateLong = now.format(DateTimeFormatter.ofPattern("yyyyMMdd"))
    val icn = now.format(DateTimeFormatter.ofPattern("yyMMddHHmm"))
    val gcn = now.format(DateTimeFormatter.ofPattern("HHmmss"))
    val tcn = "0001"
    def pad15(s: String): String = s.padTo(15, ' ')
    val isa = s"ISA*00*          *00*          *ZZ*${pad15(receiverId)}*ZZ*${pad15(senderId)}*$dateShort*$time*^*00501*$icn*0*T*:~"
    val gs = s"GS*FA*$receiverId*$senderId*$dateLong*$time*$gcn*X*005010~"
    val st = s"ST*997*$tcn~"
    val ak1 = s"AK1*${functionalGroupControlNumber.take(2)}*$functionalGroupControlNumber~"
    val akPairs = transactionSetControlNumbers.flatMap { ts =>
      Seq(s"AK2*${ts.take(3)}*$ts~", s"AK5*$ackCode~")
    }
    val n = transactionSetControlNumbers.length
    val accepted = if (ackCode == "A") n else 0
    val ak9 = s"AK9*$ackCode*$n*$n*$accepted~"
    val segmentCount = 4 + akPairs.length + 1 // ST+AK1+pairs+AK9+SE
    val se = s"SE*$segmentCount*$tcn~"
    val ge = s"GE*1*$gcn~"
    val iea = s"IEA*1*$icn~"
    (Seq(isa, gs, st, ak1) ++ akPairs ++ Seq(ak9, se, ge, iea)).mkString("\n")
  }

  /** A5 + P19: per-partner envelope aggregation then 997 generation
    * (generate_x12_acknowledgments.py:155-186). Control-number lists are
    * sorted so the output is independent of partition order.
    *
    * The reference hardcodes ack code "A" and leaves error detection as a
    * declared enhancement (the `lit("A")  # Accept all for now — could be
    * enhanced with error detection` comment at :179).
    * `qualityDrivenAckCode=true` implements that declaration: a partner
    * whose batch contains any invalid transaction gets "E" (accepted with
    * errors); all-valid batches get "A". Default stays reference parity.
    */
  def acknowledgments(silver: DataFrame, batchId: String, now: LocalDateTime,
      qualityDrivenAckCode: Boolean = false): DataFrame = {
    val gen = udf { (sender: String, receiver: String, gcn: String,
        tcns: Seq[String], code: String) =>
      generate997(sender.trim, receiver.trim, Option(gcn).getOrElse(""),
        tcns, code, now)
    }
    val ackCode =
      if (qualityDrivenAckCode)
        when(col("n_invalid") > 0, lit("E")).otherwise(lit("A"))
      else lit("A")
    silver
      .groupBy("sender_id", "receiver_id")
      .agg(
        sort_array(collect_list("interchange_control_number")).as("interchange_numbers"),
        sort_array(collect_list("functional_group_number")).as("group_numbers"),
        sort_array(collect_list("transaction_set_control_number")).as("transaction_numbers"),
        count(lit(1)).as("file_count"),
        sum(when(!col("is_valid"), 1).otherwise(0)).as("n_invalid"),
        max("processing_timestamp").as("last_processed"),
        sort_array(collect_list("file_name")).as("processed_files"))
      .withColumn("ack_code", ackCode)
      .withColumn("acknowledgment_content",
        gen(col("sender_id"), col("receiver_id"),
          element_at(col("group_numbers"), 1), col("transaction_numbers"),
          col("ack_code")))
      .withColumn("ack_filename",
        concat(trim(col("sender_id")), lit("_997_"), lit(batchId), lit(".x12")))
      .withColumn("generation_timestamp", current_timestamp())
  }

  /** S9 without the driver loop: partitioned single-column text write — one
    * directory per partner, executor-side only.
    */
  def writeAckFiles(acks: DataFrame, outDir: String): Unit =
    acks.select(trim(col("sender_id")).as("partner"),
        col("acknowledgment_content").as("value"))
      .repartition(col("partner"))
      .write.mode("overwrite").partitionBy("partner").text(outDir)

  /** P20 structural validator (generate_x12_acknowledgments.py:298-316):
    * required segments present, first segment ISA, last segment IEA.
    */
  def validate997(acks: DataFrame): DataFrame = {
    val c = col("acknowledgment_content")
    val required = Seq("ISA", "GS", "ST", "AK1", "AK9", "SE", "GE", "IEA")
    val missing = array_compact(array(required.map(seg =>
      when(!c.contains(seg + "*"), lit(s"Missing segment: $seg"))): _*))
    acks
      .withColumn("ack_missing_segments", missing)
      .withColumn("ack_is_valid",
        size(missing) === 0 &&
          c.startsWith("ISA*") &&
          c.rlike("IEA\\*[^~]*\\*[^~]*~\\s*$"))
  }

  /** Ack metadata table (generate_x12_acknowledgments.py:208-219). */
  def metadata(acks: DataFrame): DataFrame =
    acks.select("sender_id", "receiver_id", "ack_filename", "file_count",
      "generation_timestamp", "processed_files")
}
