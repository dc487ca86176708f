package graft

import org.apache.spark.sql.functions._

/** r12 verdict #6 (three-arm since r15): the td53 (multi-query BM25)
  * counterpart of [[AbBm25Bigram]] — measure the JOIN kernel (one termFreq
  * explode cut to the union token set, shared census, per-(query, doc)
  * aggregate, query-partitioned rank window), the legacy FUSED kernel
  * (one graft_query_hits census over the union set, then per query one
  * graft_bm25q projection + TakeOrderedAndProject — Q corpus passes), and
  * the r15 MULTI kernel (the census pass + ONE graft_bm25q_multi
  * projection scoring every query, explode, query-partitioned top-k
  * window — two corpus passes at any Q) at WIDE vocabulary.
  *
  * The r13/r14 rounds measured the fused-vs-join crossover at ~Q=64 and
  * routed on query count; the multi kernel exists to dominate BOTH ends
  * (fused's map-side cut + join's single pass), which this harness
  * verifies at the same Q points.
  *
  * Protocol: AbBm25Bigram's — corpus reused from the same
  * manifest-stamped dir, row-identity parity first, warm all paths off
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
    require(!sys.env.contains("GRAFT_BM25_MULTI_FUSED"),
      "unset GRAFT_BM25_MULTI_FUSED for the A/B — the arms pin their own shapes")
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

    // fused = Some(true) pins the legacy Q-pass kernel, Some(false) the
    // join kernel; None (env unset, required above) is the multi default.
    val arms = Seq("join" -> Some(false), "fused" -> Some(true),
      "multi" -> None)
    def run(arm: Option[Boolean]): org.apache.spark.sql.DataFrame =
      graft.operators.Retrieval.bm25RankQueries(docs, "doc_id", "text",
        queries, topK = 10, fused = arm)

    // row-identity first: any divergence aborts the measurement
    val ref = run(arms.head._2)
    for ((name, arm) <- arms.tail) {
      val out = run(arm)
      require(ref.except(out).count() == 0 && out.except(ref).count() == 0,
        s"$name multi-query BM25 diverged from ${arms.head._1}")
    }

    def time(arm: Option[Boolean]): Double = {
      val t0 = System.nanoTime()
      BenchHarness.executeFully(run(arm))
      (System.nanoTime() - t0) / 1e9
    }
    arms.foreach { case (_, arm) => time(arm) } // warm, off the clock
    val runs = (1 to 5).map(_ => arms.map { case (_, arm) => time(arm) })
    val byArm = arms.indices.map(i => runs.map(_(i)))
    val nVocab = docs
      .select(explode(split(col("text"), " ")).as("t")).distinct().count()
    val armJson = arms.zipWithIndex.map { case ((name, _), i) =>
      s""""${name}_best":${byArm(i).min},""" +
        s""""${name}_all":[${byArm(i).mkString(",")}]"""
    }.mkString(",")
    println(s"""{"metric":"ab_bm25_multi_$mode","factor":$factor,""" +
      s""""n_queries":$nQueries,"vocab":$nVocab,""" +
      s""""query_terms":${queries.count()},$armJson}""")
    spark.stop()
  }
}
