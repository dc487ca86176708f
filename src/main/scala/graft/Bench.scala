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
    // generation isn't billed to the first x12_* query, and pre-fill the
    // shared x12 silver cache so the one-time distributed parse (measured
    // separately below as x12_parse_tx_per_sec) isn't billed to whichever
    // x12_* query the map happens to order first
    try {
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1))).collect()
      graft.x12.X12TestDataGen.writeCorpus(
        s"${System.getProperty("java.io.tmpdir")}/graft_x12_corpus_v1", 45, seed = 42L)
      SparkEntry.queries("x12_61_silver_parse")(spark, sfDir).count()
    } catch { case _: Throwable => }
    // best-of-2 per query: the second run reflects steady-state (codegen
    // compiled, JIT warm) — the DuckDB oracle sidecar times best-of-2 too.
    // A failed query reports -1 (never a fake fast timing) and is excluded
    // from the total.
    val results = SparkEntry.queries.map { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val t = try math.min(once(), once())
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); -1.0 }
      name -> t
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
    // BASELINE.md 2x gate, MEASURED: time each DuckDB oracle over the same
    // tables (sidecar python process — the oracle engine is driver-side
    // tooling, not a library dependency) and report spark/duck ratios.
    // Best-effort: the bench line never fails if python/duckdb are absent.
    val oracleJson: String = try {
      def esc(s: String): String = "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case '\r' => "\\r"
        case '\t' => "\\t"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
      val dir = java.nio.file.Files.createTempDirectory("graft_bench")
      val of = dir.resolve("oracle_sql.json")
      java.nio.file.Files.writeString(of, SparkEntry.oracleSql
        .map { case (k, v) => s"${esc(k)}: ${esc(v)}" }.mkString("{", ",", "}"))
      val tf = dir.resolve("spark_timings.json")
      java.nio.file.Files.writeString(tf, qs)
      // stderr inherits (no pipe to fill and deadlock on); stdout drains on
      // a daemon thread so the timeout below actually fires on a hung child
      val proc = new ProcessBuilder(
        "python3", "tools/bench_oracle.py", sfDir, of.toString, tf.toString)
        .redirectError(ProcessBuilder.Redirect.INHERIT)
        .start()
      val outBuf = new java.util.concurrent.atomic.AtomicReference[String]("")
      val reader = new Thread(() =>
        try outBuf.set(new String(proc.getInputStream.readAllBytes(), "UTF-8").trim)
        catch { case _: Throwable => })
      reader.setDaemon(true)
      reader.start()
      val done = proc.waitFor(10, java.util.concurrent.TimeUnit.MINUTES)
      if (!done) { proc.destroyForcibly(); "null" }
      else {
        reader.join(10000)
        val out = outBuf.get()
        if (proc.exitValue() == 0 && out.startsWith("{")) out else "null"
      }
    } catch { case _: Throwable => "null" }
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"x12_parse_tx_per_sec":$txPerSec,"oracle":$oracleJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
