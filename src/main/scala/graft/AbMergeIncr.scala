package graft

import org.apache.spark.sql.functions._

/** r13: measure what [[graft.operators.TextDedup.mergeClusters]] buys —
  * folding a SMALL batch (1/12 of the corpus, the production refresh
  * shape) into a prebuilt label + signature store versus rebuilding the
  * clusters from scratch, on the heavy fixture. The stores are prebuilt
  * OFF the clock (they are the maintained state a pipeline carries);
  * parity of the two outputs is asserted before any timing. Best-of-N
  * alternating warm draws, ONE JSON line. Run with the machine quiet;
  * record the load average (BASELINE control protocol).
  *
  * `SPARK_GRAFT_AB_DUP=low` (r13 verdict #3): the heavy fixture's 10×
  * duplication rate is ADVERSARIAL for the incremental form — nearly
  * every cluster sits in a batch's blast radius, so the r13 win read
  * only 1.9×. The design point is a production-rate corpus where most
  * documents are unique; this mode synthesizes one deterministically
  * from ids alone (20 md5-hex tokens per document — the dd57
  * wide-vocabulary construction — with every 20th id pair sharing text,
  * duplication 20/19 ≈ 1.05×), built off the clock, and measures the
  * same merge-vs-rebuild A/B on it.
  */
object AbMergeIncr {

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sfheavy_v1")
    val runs = sys.env.getOrElse("SPARK_GRAFT_AB_RUNS", "3").toInt
    val dup = sys.env.getOrElse("SPARK_GRAFT_AB_DUP", "fixture")
    // fail loud on typos (r14 advice): any unknown value used to fall
    // back silently to the fixture corpus while the artifact recorded
    // the raw string in its dup field — the GRAFT_BM25_MULTI_FUSED
    // env discipline applies here too
    require(dup == "fixture" || dup == "low",
      s"SPARK_GRAFT_AB_DUP must be 'fixture' or 'low', got '$dup'")
    val spark = AbBm25Bigram.abSession()
    import graft.operators.TextDedup
    graft.functions.GraftFunctions.register(spark)

    val all = if (dup == "low") {
      val n = sys.env.getOrElse("SPARK_GRAFT_AB_ROWS", "50000").toLong
      spark.range(n).toDF("doc_id")
        .withColumn("__base",
          when(col("doc_id") % 20 === 1, col("doc_id") - 1)
            .otherwise(col("doc_id")))
        .withColumn("text",
          array_join(transform(sequence(lit(0), lit(19)),
            j => md5(concat(lit("lowdup|"), col("__base").cast("string"),
              lit("|"), j.cast("string")))), " "))
        .select("doc_id", "text")
        .localCheckpoint(true)
    } else graft.queries.Q.t(spark, dir, "documents")
    val storeDocs = all.filter(col("doc_id") % 12 =!= 0)
    val batch = all.filter(col("doc_id") % 12 === 0)

    // the maintained state, built off the clock (eager checkpoints so no
    // timed run pays their lineage)
    val storeLabels = TextDedup.dupClusters(
      TextDedup.minhashLshPairs(storeDocs, "doc_id", "text",
        bands = 2, rowsPerBand = 2, fast = true)).localCheckpoint(true)
    val storePost = TextDedup.bandPostings(storeDocs, "doc_id", "text",
      bands = 2, rowsPerBand = 2, fast = true).localCheckpoint(true)

    def incr() = TextDedup.mergeClusters(storeLabels, storePost, batch,
      "doc_id", "text", bands = 2, rowsPerBand = 2, fast = true)._1
    def full() = TextDedup.dupClusters(
      TextDedup.minhashLshPairs(all, "doc_id", "text",
        bands = 2, rowsPerBand = 2, fast = true))

    // parity first: the incremental result must BE the from-scratch one
    val (i0, f0) = (incr(), full())
    require(i0.except(f0).count() == 0 && f0.except(i0).count() == 0,
      "incremental merge diverged from the from-scratch clusters")

    def time(f: () => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      BenchHarness.executeFully(f())
      (System.nanoTime() - t0) / 1e9
    }
    time(incr _); time(full _) // warm both paths off the clock
    val draws = (1 to runs).map(_ => (time(incr _), time(full _)))
    val incrAll = draws.map(_._1)
    val fullAll = draws.map(_._2)
    println(s"""{"metric":"ab_merge_incremental","dir":"$dir",""" +
      s""""dup":"$dup",""" +
      s""""batch_rows":${batch.count()},"store_rows":${storeDocs.count()},""" +
      s""""incr_best":${incrAll.min},"full_best":${fullAll.min},""" +
      s""""incr_all":[${incrAll.mkString(",")}],""" +
      s""""full_all":[${fullAll.mkString(",")}]}""")
    spark.stop()
  }
}
