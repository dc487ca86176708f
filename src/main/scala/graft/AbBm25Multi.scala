package graft

import org.apache.spark.sql.functions._

/** r12 verdict #6: the td53 (multi-query BM25) counterpart of
  * [[AbBm25Bigram]] — measure the JOIN kernel (one termFreq explode cut
  * to the union token set, shared census, per-(query, doc) aggregate,
  * query-partitioned rank window) against the FUSED kernel (one
  * graft_query_hits census over the union set, then per query one
  * graft_bm25q projection + TakeOrderedAndProject) at WIDE vocabulary.
  *
  * The open question the r12 deferral documents: unlike the
  * single-query case — where fused won the bigram A/B by ~22% — the
  * multi-query join form amortizes its one corpus explode across ALL
  * queries while the fused form pays Q corpus projections, so the join
  * form may genuinely hold as Q grows. Measured at the td53 shape
  * (Q = 2, doc-0/doc-1 token sets) and at Q = 8 to expose the
  * crossover, bigram tokens, factor 30.
  *
  * Protocol: AbBm25Bigram's — corpus reused from the same
  * manifest-stamped dir, row-identity parity first, warm both paths off
  * the clock, alternate timed runs, best-of-5 per form, ONE JSON line.
  * Run with the machine quiet; record the load average (BASELINE
  * control protocol).
  */
object AbBm25Multi {

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_HEAVY_FACTOR", "30").toInt
    val mode = sys.env.getOrElse("SPARK_GRAFT_AB_TOKENS", "bigram")
    val nQueries = sys.env.getOrElse("SPARK_GRAFT_AB_QUERIES", "2").toInt
    require(nQueries >= 1, s"SPARK_GRAFT_AB_QUERIES must be >= 1")
    val spark = AbBm25Bigram.abSession()
    val docs = spark.read.parquet(
      AbBm25Bigram.ensureCorpus(spark, base, factor, mode))

    // query q = doc q's distinct token set (the td53 fixture shape,
    // extended to nQueries seed documents)
    val queries = docs.filter(col("doc_id") < nQueries)
      .select(col("doc_id").as("query_id"),
        explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
      .distinct()

    def run(fused: Boolean): org.apache.spark.sql.DataFrame =
      graft.operators.Retrieval.bm25RankQueries(docs, "doc_id", "text",
        queries, topK = 10, fused = Some(fused))

    // row-identity first: any divergence aborts the measurement
    val j0 = run(fused = false)
    val f0 = run(fused = true)
    require(j0.except(f0).count() == 0 && f0.except(j0).count() == 0,
      "fused and join multi-query BM25 diverged")

    def time(fused: Boolean): Double = {
      val t0 = System.nanoTime()
      BenchHarness.executeFully(run(fused))
      (System.nanoTime() - t0) / 1e9
    }
    time(fused = false); time(fused = true)
    val runs = (1 to 5).map(_ => (time(fused = false), time(fused = true)))
    val joinAll = runs.map(_._1)
    val fusedAll = runs.map(_._2)
    val nVocab = docs
      .select(explode(split(col("text"), " ")).as("t")).distinct().count()
    println(s"""{"metric":"ab_bm25_multi_$mode","factor":$factor,""" +
      s""""n_queries":$nQueries,"vocab":$nVocab,""" +
      s""""query_terms":${queries.count()},""" +
      s""""join_best":${joinAll.min},"fused_best":${fusedAll.min},""" +
      s""""join_all":[${joinAll.mkString(",")}],""" +
      s""""fused_all":[${fusedAll.mkString(",")}]}""")
    spark.stop()
  }
}
