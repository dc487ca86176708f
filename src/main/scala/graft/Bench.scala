package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the JVM/codegen/parquet-footer paths so query 1 isn't charged
    // for session startup; pre-write the x12 corpus so driver-side file
    // generation isn't billed to the first x12_* query
    try {
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1))).collect()
      graft.x12.X12TestDataGen.writeCorpus(
        s"${System.getProperty("java.io.tmpdir")}/graft_x12_corpus_v1", 45, seed = 42L)
    } catch { case _: Throwable => }
    // a failed query reports -1 (never a fake fast timing) and is excluded
    // from the total
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    // X12 parse throughput vs the reference's 1,000 tx/hour baseline
    // (docs/performance-tuning-guide.md:22 — driver-bound Python parse):
    // distributed wholetext parse of a generated corpus, transactions/sec.
    val txPerSec = try {
      val corpus = s"${System.getProperty("java.io.tmpdir")}/graft_x12_bench_corpus"
      graft.x12.X12TestDataGen.writeCorpus(corpus, 600, seed = 7L)
      import spark.implicits._
      val files = graft.x12.X12Silver.readFiles(spark, corpus)
      val t0 = System.nanoTime()
      val n = graft.x12.X12Silver.parse(files, "BENCH",
        java.sql.Date.valueOf("2025-09-01"),
        java.sql.Timestamp.valueOf("2025-09-01 12:00:00")).count()
      n / ((System.nanoTime() - t0) / 1e9)
    } catch { case _: Throwable => -1.0 }
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"x12_parse_tx_per_sec":$txPerSec,"sf":"$sfDir"}""")
    spark.stop()
  }
}
