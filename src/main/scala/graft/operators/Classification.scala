package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** In-engine text classification — the fastText-style document classifier
  * a curation pipeline uses for language ID, quality gating, and domain
  * tagging at corpus scale. Multinomial Naive Bayes with Laplace
  * smoothing: training IS counting (one token-keyed census per corpus
  * pass — integer-exact, mergeable, incrementally maintainable), and
  * scoring is a per-token log-likelihood sum — no gradient loop, no
  * float accumulation hazard, which is what makes the whole path
  * hash-oracle-able cross-engine.
  *
  * Arithmetic contract: with Laplace smoothing,
  *   score(d, l) = log₂ P(l) + Σ_t tf_t · log₂ (c(l,t)+1)/(T_l+V)
  * decomposes as
  *   log₂ P(l)  +  Σ_t tf_t · log₂(c(l,t)+1)  −  n_d · log₂(T_l+V)
  * so unseen (token, label) pairs contribute log₂ 1 = 0 and the score
  * needs ONLY the seen (token, label) count rows — the sparse join a
  * 100 TB corpus requires anyway. Every log₂ argument is an exact
  * integer or integer ratio; each term is floor-quantized at
  * `quantScale` into a long, so per-document totals are integer sums
  * (partition-order-proof) and the argmax is exact.
  *
  * Scale: the label set is model-sized (it is crossed with the test
  * docs via broadcast); the count census shuffles the (vocab × labels)
  * frame partial-aggregated; the scoring join is token-keyed and
  * key-bounded. No collect of anything corpus-sized.
  */
object Classification {

  /** Train on `train` (labelCol supplies the class) and predict a label
    * for every `test` document.
    *
    * @return (doc_id, pred_label, score_q) — score_q is the winning
    *         quantized joint log-likelihood; ties break on label
    *         ascending (deterministic in any engine)
    */
  def nbClassify(train: DataFrame, test: DataFrame, idCol: String,
      textCol: String, labelCol: String,
      quantScale: Long = 1024L): DataFrame = {
    graft.functions.GraftFunctions.register(train.sparkSession)
    val F = graft.functions.GraftFunctions
    val q = quantScale
    def log2q(x: org.apache.spark.sql.Column) =
      floor(log2(x) * q).cast("long")
    // per-label (token, count) census — train tf pre-aggregated per doc
    // by graft_tf, then one (label, token)-keyed exchange
    val counts = train.select(col(labelCol).as("label"),
        explode(F.termFreq(split(col(textCol), " "))).as("t"))
      .groupBy(col("label"), col("t.token").as("token"))
      .agg(sum(col("t.tf")).as("c"))
    // label stats: docs per label, tokens per label; V = train vocab
    val labelStats = train.select(col(labelCol).as("label"),
        size(split(col(textCol), " ")).cast("long").as("n"))
      .groupBy("label")
      .agg(count(lit(1)).as("docs_l"), sum(col("n")).as("tok_l"))
    val nTrain = train.count()
    val vocab = counts.select("token").distinct().count()
    // base term per label: quantized prior + the (T_l + V) penalty rate
    val labels = labelStats.select(col("label"),
      log2q(col("docs_l").cast("double") / lit(nTrain.toDouble))
        .as("prior_q"),
      log2q((col("tok_l") + lit(vocab)).cast("double")).as("rate_q"))
    // test side: per-doc tf frame (shuffle-free off the scan)
    val tf = test.select(col(idCol).as("doc_id"),
        explode(F.termFreq(split(col(textCol), " "))).as("t"))
      .select(col("doc_id"), col("t.token").as("token"),
        col("t.tf").as("tf"), col("t.n_terms").as("n_d"))
    // seen-pair contributions: token-keyed join against the census;
    // unseen pairs contribute log2(0+1) = 0 by construction
    val seen = tf.join(counts.hint("shuffle_hash"), Seq("token"))
      .groupBy("doc_id", "label")
      .agg(sum(col("tf") * log2q((col("c") + 1).cast("double")))
        .as("seen_q"))
    // every (doc, label) base score, seen contributions added where any
    val base = tf.groupBy("doc_id").agg(max(col("n_d")).as("n_d"))
      .crossJoin(broadcast(labels))
      .withColumn("base_q",
        col("prior_q") - col("n_d") * col("rate_q"))
    val scores = base.join(seen, Seq("doc_id", "label"), "left")
      .withColumn("score_q",
        col("base_q") + coalesce(col("seen_q"), lit(0L)))
    // exact integer argmax, label-ascending tiebreak
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id")
      .orderBy(col("score_q").desc, col("label").asc)
    scores.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("label").as("pred_label"), col("score_q"))
  }
}
