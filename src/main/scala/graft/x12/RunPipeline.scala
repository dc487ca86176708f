package graft.x12

import java.time.LocalDateTime
import org.apache.spark.sql.SparkSession

/** CLI entry point for one medallion batch run — the operational analog of
  * the reference's DAG trigger (x12_processing_dag.py:28: scheduler invokes
  * bronze→silver→gold→ack every 15 minutes; here the scheduler invokes this
  * main).
  *
  * Usage: runMain graft.x12.RunPipeline <landingDir> <outDir> [batchId]
  */
object RunPipeline {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: RunPipeline <landingDir> <outDir> [batchId]")
    val landingDir = args(0)
    val outDir = args(1)
    val now = LocalDateTime.now()
    // sanitized so the summary line below stays valid JSON and the id is
    // safe inside generated file names
    val batchId = (if (args.length > 2) args(2)
      else "BATCH_" + now.format(java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd_HHmmss")))
      .replaceAll("[^A-Za-z0-9_-]", "_")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // the session factory carries the engine's scale stance (AQE + skew
    // join, zstd, UTC, graft functions); shuffle partitions sized to cores
    val spark = graft.GraftSession.getOrCreate(
      SparkSession.builder()
        .master(sys.env.getOrElse("SPARK_MASTER", s"local[$cpus]"))
        .appName(s"graft-x12-$batchId"),
      shufflePartitions = cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")
    try {
      val result = X12Pipeline.run(spark, landingDir, outDir, batchId,
        java.sql.Date.valueOf(now.toLocalDate),
        java.sql.Timestamp.valueOf(now), now,
        qualityDrivenAckCode =
          sys.env.get("SPARK_GRAFT_ACK_QUALITY").contains("1"))
      val files = result.bronze.count()
      val txs = result.silver.count()
      val acks = result.acks.count()
      // the notebook-exit JSON contract (bronze_x12_ingestion.py:318)
      println(s"""{"batch_id":"$batchId","files":$files,"transactions":$txs,"acknowledgments":$acks,"out":"$outDir"}""")
    } finally spark.stop()
  }
}
