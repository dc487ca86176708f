package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r11 verdict #4: re-A/B the fused BM25 kernel (graft_query_hits +
  * graft_bm25q) against the candidate-join form on a WIDE-vocabulary
  * corpus. The r11 wash was measured at the fixture's unigram
  * vocabulary — 31 distinct words, and a single-document query covers
  * ~80% of them, so the broadcast cut kills almost nothing and the
  * corpus-explode volume the fusion saves is small. Bigram tokens (the
  * td41 census shape) widen the universe ~30× (931 distinct at sf0.1)
  * while a doc-0 query covers ~5% of it — the regime where the join
  * form's explode-then-cut pays for rows the fused census never emits.
  *
  * Protocol: replicate the sf base documents by SPARK_GRAFT_HEAVY_FACTOR
  * (default 30, the falling-curve tier point), rewrite each text as its
  * space-joined adjacent-word bigrams ONCE (both forms read the same
  * materialized corpus — the transform is off the clock), parity-check
  * the two forms row-identical, then alternate warm timed runs and
  * report best-of-5 per form as one JSON line. Run with the machine
  * quiet; record the load average (BASELINE control protocol).
  */
object AbBm25Bigram {

  /** Shared A/B session builder (AbBm25Bigram + AbBm25Multi). */
  private[graft] def abSession(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", (128 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** The wide-vocabulary corpus, replicated and materialized once
    * (BenchHeavy's splittable single-file layout so the scan
    * parallelizes); `mode` is "bigram" (each text rewritten as its
    * space-joined adjacent-word bigrams — ~30× the unigram vocabulary)
    * or "unigram" (the raw fixture text). Returns the corpus parquet
    * path; reused manifest-stamped across runs and across the two A/B
    * mains.
    */
  private[graft] def ensureCorpus(spark: SparkSession, base: String,
      factor: Int, mode: String): String = {
    require(mode == "bigram" || mode == "unigram",
      s"token mode must be bigram or unigram, got '$mode' — " +
        "a typo'd mode would record a mislabeled measurement")
    val root = Paths.get(
      s"${System.getProperty("java.io.tmpdir")}/graft_${mode}_heavy")
    Files.createDirectories(root)
    val corpus = root.resolve("documents.parquet")
    val manifest = root.resolve("_manifest.txt")
    val stamp = s"base=$base factor=$factor v=1 $mode"
    if (!Files.exists(manifest) || Files.readString(manifest) != stamp) {
      val staging = Files.createTempDirectory("graft_bigram_stage")
        .resolve("base.parquet")
      val bigramText = expr(
        "array_join(zip_with(" +
          "slice(split(text, ' '), 1, greatest(size(split(text, ' ')) - 1, 0)), " +
          "slice(split(text, ' '), 2, greatest(size(split(text, ' ')) - 1, 0)), " +
          "(a, b) -> concat(a, '~', b)), ' ')")
      val tokText = if (mode == "unigram") col("text") else bigramText
      val docs = spark.read.parquet(s"$base/documents.parquet")
        .select(col("doc_id"), tokText.as("text"))
      docs.coalesce(1).write.mode("overwrite")
        .parquet(staging.getParent.toString)
      val part = staging.getParent.toFile.listFiles()
        .find(_.getName.endsWith(".parquet"))
        .getOrElse(sys.error("no staged bigram part")).toPath
      val basePath = root.resolve("base.parquet")
      Files.move(part, basePath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      BenchHeavy.replicate(spark, basePath.toString, corpus, "doc_id", factor)
      Files.writeString(manifest, stamp)
    }
    corpus.toString
  }

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_HEAVY_FACTOR", "30").toInt
    // "bigram" (default) or "unigram" — the latter reproduces the r11
    // fixture-vocabulary wash on the SAME machine-day for an honest pair
    val mode = sys.env.getOrElse("SPARK_GRAFT_AB_TOKENS", "bigram")
    val spark = abSession()
    val docs = spark.read.parquet(ensureCorpus(spark, base, factor, mode))
    val query = docs.filter(col("doc_id") === 0)
      .select(explode(split(col("text"), " ")).as("token")).distinct()
      .filter(length(col("token")) > 0)

    def run(fused: Boolean): org.apache.spark.sql.DataFrame =
      graft.operators.Retrieval.bm25Rank(docs, "doc_id", "text", query,
        topK = 10, fused = Some(fused))

    // row-identity first (the spec-pinned contract, re-checked at tier
    // vocabulary): any divergence aborts the measurement
    val j0 = run(fused = false)
    val f0 = run(fused = true)
    require(j0.except(f0).count() == 0 && f0.except(j0).count() == 0,
      "fused and join BM25 diverged on the bigram corpus")

    def time(fused: Boolean): Double = {
      val t0 = System.nanoTime()
      BenchHarness.executeFully(run(fused))
      (System.nanoTime() - t0) / 1e9
    }
    // warm both paths off the clock, then alternate
    time(fused = false); time(fused = true)
    val runs = (1 to 5).map(_ => (time(fused = false), time(fused = true)))
    val joinAll = runs.map(_._1)
    val fusedAll = runs.map(_._2)
    val nVocab = docs
      .select(explode(split(col("text"), " ")).as("t")).distinct().count()
    println(s"""{"metric":"ab_bm25_$mode","factor":$factor,""" +
      s""""vocab":$nVocab,"query_terms":${query.count()},""" +
      s""""join_best":${joinAll.min},"fused_best":${fusedAll.min},""" +
      s""""join_all":[${joinAll.mkString(",")}],""" +
      s""""fused_all":[${fusedAll.mkString(",")}]}""")
    spark.stop()
  }
}
