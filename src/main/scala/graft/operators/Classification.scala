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
  * Scale: the label set is model-sized — the L (prior, rate) rows are
  * collected to the driver (the BPE-rules precedent) and the census
  * pivots into one finished-lpq column per label, so the scoring side
  * is ONE token-keyed vocabulary lookup join plus ONE per-document
  * aggregate: no L-way row expansion, no (doc, label) exchange, and
  * the argmax is a codegen struct-`greatest` in the same projection.
  * The count census shuffles the (vocab × labels) frame
  * partial-aggregated. No collect of anything corpus-sized.
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
      quantScale: Long = 1024L,
      maxBroadcastVocabRows: Long = 4000000L,
      fused: Option[Boolean] = None): DataFrame = {
    val counts = nbCensus(train, textCol, labelCol)
    val labelStats = nbLabelStats(train, textCol, labelCol)
    val nTrain = train.count()
    nbClassifyFromModel(counts, labelStats, nTrain, test, idCol, textCol,
      quantScale, maxBroadcastVocabRows, fused)
  }

  /** The per-label (token, count) census — train tf pre-aggregated per
    * doc by `graft_tf`, then one (label, token)-keyed exchange. MERGEABLE
    * state: two censuses union + re-sum to the census of the combined
    * corpus, which is what makes NB training incrementally maintainable
    * (the st56 partials idiom; st61 runs it across micro-batches).
    */
  def nbCensus(train: DataFrame, textCol: String,
      labelCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(train.sparkSession)
    val F = graft.functions.GraftFunctions
    train.select(col(labelCol).as("label"),
        explode(F.termFreq(split(col(textCol), " "))).as("t"))
      .groupBy(col("label"), col("t.token").as("token"))
      .agg(sum(col("t.tf")).as("c"))
  }

  /** Per-label doc and token totals — the census's companion state,
    * mergeable the same way (sum/sum).
    */
  def nbLabelStats(train: DataFrame, textCol: String,
      labelCol: String): DataFrame =
    train.select(col(labelCol).as("label"),
        size(split(col(textCol), " ")).cast("long").as("n"))
      .groupBy("label")
      .agg(count(lit(1)).as("docs_l"), sum(col("n")).as("tok_l"))

  /** Scoring against a PREBUILT model — `counts` = [[nbCensus]] frame,
    * `labelStats` = [[nbLabelStats]] frame, `nTrain` the train doc
    * count. Same output contract as [[nbClassify]]; how the model frames
    * were accumulated (one shot or merged micro-batch partials) is
    * invisible here, which is exactly what st61's streaming-maintenance
    * parity asserts.
    */
  def nbClassifyFromModel(counts: DataFrame, labelStats: DataFrame,
      nTrain: Long, test: DataFrame, idCol: String, textCol: String,
      quantScale: Long = 1024L,
      maxBroadcastVocabRows: Long = 4000000L,
      fused: Option[Boolean] = None,
      maxFusedVocabRows: Long = 1000000L): DataFrame = {
    graft.functions.GraftFunctions.register(test.sparkSession)
    val F = graft.functions.GraftFunctions
    val q = quantScale
    def log2q(x: org.apache.spark.sql.Column) =
      floor(log2(x) * q).cast("long")
    val vocab = counts.select("token").distinct().count()
    // THE MODEL IS LABEL-SIZED: collect (label, prior_q, rate_q) to the
    // driver (the BPE-rules precedent — L rows, not data) so the whole
    // scoring side becomes one vocab-pivoted lookup instead of an
    // L-way row expansion through a (doc, label) exchange
    val labelRows = labelStats.select(col("label"),
        log2q(col("docs_l").cast("double") / lit(nTrain.toDouble))
          .as("prior_q"),
        log2q((col("tok_l") + lit(vocab)).cast("double")).as("rate_q"))
      .orderBy("label").collect()
    require(labelRows.nonEmpty, "nbClassify: empty training corpus")
    val labels = labelRows.map(_.getString(0)).toSeq
    // pivot the census into one finished lpq column per label — one row
    // per token (vocabulary-sized), indexed columns so label VALUES
    // never become identifier text
    val liCol = labels.zipWithIndex.tail.foldLeft(
      when(col("label") === labels.head, 0)) { case (acc, (l, i)) =>
        acc.when(col("label") === l, i) }
    val pivoted = counts
      .withColumn("li", liCol)
      .withColumn("lpq_c", log2q((col("c") + 1).cast("double")))
      .groupBy("token")
      .pivot("li", labels.indices)
      .agg(first(col("lpq_c")))
      .select(col("token") +: labels.indices.map(i =>
        coalesce(col(s"`$i`"), lit(0L)).as(s"lpq_$i")): _*)
      .localCheckpoint(false)
    // test side, two plan shapes with IDENTICAL integer output
    // (spec-pinned; the oracled td52/td55 hashes hold on either):
    //  - FUSED (r10 verdict #5, the graft_gopher_stats precedent): the
    //    pivoted census collects to the driver (vocabulary-bounded — it
    //    IS the model) and inlines into one graft_nb_seen codegen loop,
    //    so scoring is a pure projection: no per-token rows, no lookup
    //    join, no per-doc re-aggregate;
    //  - JOIN (the 100 TB-vocabulary path, and the A/B baseline —
    //    GRAFT_NB_FUSED=0 forces it): per-doc tf frame (shuffle-free off
    //    the scan), ONE token-keyed lookup join (broadcast under the
    //    bound, else key-bounded shuffle-hash), ONE per-doc aggregate
    //    (partial aggregation collapses per doc map-side).
    val useFused = fused.getOrElse(
      sys.env.get("GRAFT_NB_FUSED").forall(_ != "0") &&
        vocab <= maxFusedVocabRows)
    val perDoc = if (useFused) {
      // fail-loud, not OOM, when the fused path is FORCED past the bound
      // (the requireSmallQuerySet convention): the driver collect below
      // is vocabulary-sized
      require(vocab <= maxFusedVocabRows,
        s"nbClassifyFromModel: fused scoring collects the $vocab-token " +
          s"vocabulary to the driver, above maxFusedVocabRows " +
          s"($maxFusedVocabRows) — use the join form or raise the bound")
      val lut: Map[String, Seq[Long]] = pivoted.collect().map { r =>
        r.getString(0) -> labels.indices.map(i => r.getLong(i + 1))
      }.toMap
      val sc = F.nbSeen(split(col(textCol), " "), lut, labels.size)
      test.select(col(idCol).as("doc_id"), sc.as("__sc"))
        // the join form drops docs whose token array explodes to nothing
        // (null text) — reproduce the row set exactly
        .filter(col("__sc").isNotNull && col("__sc.n_d") > 0)
        .select(col("doc_id") +: col("__sc.n_d").as("n_d") +:
          labels.indices.map(i => col("__sc.seen")(i).as(s"seen_$i")): _*)
    } else {
      val tf = test.select(col(idCol).as("doc_id"),
          explode(F.termFreq(split(col(textCol), " "))).as("t"))
        .select(col("doc_id"), col("t.token").as("token"),
          col("t.tf").as("tf"), col("t.n_terms").as("n_d"))
      val seenCols = labels.indices.map(i =>
        sum(col("tf") * coalesce(col(s"lpq_$i"), lit(0L))).as(s"seen_$i"))
      val vocabLk =
        if (vocab <= maxBroadcastVocabRows) broadcast(pivoted)
        else pivoted.hint("shuffle_hash")
      tf.join(vocabLk, Seq("token"), "left")
        .groupBy("doc_id")
        .agg(max(col("n_d")).as("n_d"), seenCols: _*)
    }
    // exact integer argmax as a struct max: (score, -index) compares
    // score first, then index ASCENDING = label ascending (the label
    // list is sorted) — deterministic in any engine
    val scoreStructs = labelRows.toSeq.zipWithIndex.map { case (r, i) =>
      struct(
        (lit(r.getLong(1)) - col("n_d") * lit(r.getLong(2))
          + col(s"seen_$i")).as("s"),
        lit(-i).as("ni"), lit(labels(i)).as("l"))
    }
    val best =
      if (scoreStructs.size == 1) scoreStructs.head
      else greatest(scoreStructs: _*)
    perDoc.withColumn("best", best)
      .select(col("doc_id"), col("best.l").as("pred_label"),
        col("best.s").as("score_q"))
  }
}
