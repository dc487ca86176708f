package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reusable document-deduplication operators (library form of the dd30-dd35
  * query surface; see graft.queries.Dedup for the oracle-checked
  * instantiations over the fixture tables).
  *
  * Scale contract shared by every operator here:
  *  - exact dedup shuffles a 32-byte digest, never the document body;
  *  - every near-dup candidate generator is BLOCKED (caller-chosen blocking
  *    column, LSH band bucket) so no all-pairs join exists;
  *  - hashes are md5-based, reproducible in any engine.
  */
object TextDedup {

  private def toks(text: Column): Column = split(text, " ")

  /** Local expansion of a sorted array into its C(n,2) ordered element
    * pairs — the task-local pair generator every blocked candidate path
    * shares (`slice(arr, i + 2, ...)` pairs element i with every LATER
    * element, so (a, b) is emitted exactly once with a before b in array
    * order). Wrap in `explode(...)`.
    */
  private def pairwise(arr: Column, f: (Column, Column) => Column): Column =
    flatten(transform(arr, (x, i) =>
      transform(slice(arr, i + 2, size(arr)), y => f(x, y))))

  /** One row per DISTINCT text: representative id (the minimum), the
    * sorted member-id array, and the text itself — the exact-duplicate
    * collapse the round-5 candidate generators score once and expand back.
    *
    * Texts (and lines, in [[lineDedup]]'s census) are equated by
    * md5(content), the same stance as [[exactDedup]]: a collision would
    * merge two distinct texts into one group. At 2^64 texts the birthday
    * bound on a 128-bit digest puts that probability near 2^-1; at any
    * plausible corpus (2^40 documents) it is under 2^-47 — accepted, and
    * cheaper than shuffling text bodies just to break ties the digest
    * already breaks.
    */
  private def textGroups(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"), col(textCol).as("__text"))
      .groupBy(md5(col("__text")).as("__tkey"))
      .agg(min(col("doc_id")).as("rep"),
        sort_array(collect_list(col("doc_id"))).as("ids"),
        first(col("__text")).as("__text"))

  /** Distinct word-bigram shingles — the MinHash/Jaccard unit.
    *
    * `fast = true` computes them in one fused codegen loop via the native
    * `graft_shingles` expression (identical output, spec-pinned parity;
    * requires `GraftFunctions.register`). The composable default
    * interprets three HOF lambdas and materializes two slices + a zipped
    * array per row — at corpus scale the shingle computation dominates the
    * (codegen'd) joins around it.
    */
  def bigramShingles(text: Column, fast: Boolean = false): Column =
    if (fast) graft.functions.GraftFunctions.shingles(text)
    else {
      val t = toks(text)
      array_distinct(zip_with(
        slice(t, lit(1), size(t) - 1),
        slice(t, lit(2), size(t) - 1),
        (x, y) => concat(x, lit(" "), y)))
    }

  /** Exact content dedup: groups by md5(text); canonical row = min id. */
  def exactDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("fp"))
      .agg(count(lit(1)).as("cnt"), min(col(idCol)).as("canonical_id"))

  /** Boilerplate-line removal (the CCNet/RefinedWeb line-level dedup):
    * drop every line whose document frequency — the number of DISTINCT
    * documents containing it — reaches `minDocFreq`, and reassemble each
    * document's surviving lines in their original order. Cookie banners,
    * nav menus and footers repeat across a site's pages; removing them
    * line-by-line preserves the unique prose that document-level dedup
    * would keep verbatim.
    *
    * Returns (idCol, textCol, n_removed): the cleaned text (empty string
    * when every line was boilerplate — rows are never dropped) plus the
    * per-document removed-line count, the audit metric a curation run
    * monitors. Only the id and rebuilt text are returned — at corpus
    * scale the caller joins back by id rather than riding every
    * passthrough column through the explode.
    *
    * Scale shape: the census groups by a 16-byte line digest, so the
    * shuffle carries digests + ids, never line bodies; the boilerplate
    * set joins back UNHINTED (it is O(lines/minDocFreq), unbounded on a
    * template-heavy corpus — AQE broadcasts it only when its runtime size
    * fits, the applyDedup stance); the exploded line frame feeds both the
    * census and the rebuild, so it is lazily checkpoint-materialized once
    * (the ngramJaccardPairs posting-frame pattern). Reassembly is one
    * partial-aggregated groupBy on the id; a document's lines fit in its
    * task by the same argument its text column does.
    */
  def lineDedup(docs: DataFrame, idCol: String, textCol: String,
      minDocFreq: Long, sep: String = "\n"): DataFrame = {
    require(minDocFreq >= 2, s"minDocFreq must be >= 2, got $minDocFreq")
    graft.functions.GraftFunctions.register(docs.sparkSession)
    // null text reads as empty (one '' line): posexplode of a null array
    // emits NO rows, which would silently drop the document and break the
    // rows-are-never-dropped contract
    val base = docs.select(col(idCol),
      coalesce(col(textCol), lit("")).as("__text"))
    // the checkpointed frame carries (id, pos, digest) ONLY — line text
    // never enters a shuffle: the census and the hot semi-join move
    // 32-char digests, the rebuild moves int positions, and the final
    // per-doc strip re-splits the original text in one sweep
    // (graft_strip_spans at n=1, the dd50 idiom at line grain; the r8
    // form shuffled every (pos, line-text) struct through the groupBy
    // and array_sorted them per doc)
    val lines = base
      .select(col(idCol), posexplode(split(col("__text"),
        java.util.regex.Pattern.quote(sep)))
        .as(Seq("__pos", "__line")))
      .select(col(idCol), col("__pos"), md5(col("__line")).as("__lh"))
      .localCheckpoint(false)
    val hot = lines.groupBy(col("__lh"))
      .agg(countDistinct(col(idCol)).as("__df"))
      .filter(col("__df") >= minDocFreq)
      .select(col("__lh"))
    val starts = lines.join(hot, Seq("__lh"), "left_semi")
      .groupBy(col(idCol)).agg(collect_list(col("__pos")).as("__starts"))
    val stripped = graft.functions.GraftFunctions.stripSpans(col("__text"),
      coalesce(col("__starts"), array().cast("array<int>")), 1, sep)
    base.join(starts, Seq(idCol), "left")
      .select(col(idCol), stripped.as("__s"))
      .select(col(idCol),
        col("__s.text").as(textCol),
        col("__s.n_removed").as("n_removed"))
  }

  /** N-gram Jaccard near-dup pairs via a blocked inverted index:
    * |A∩B| / |A∪B| >= threshold, candidates restricted to equal blockCol.
    * `maxDocFreq` (0 = off) drops shingles whose CORPUS-GLOBAL document
    * frequency exceeds the cap (not per block — a boilerplate shingle is
    * noise wherever it appears) — the 100 TB knob: ultra-frequent shingles
    * create quadratic posting-list blowups while contributing no
    * discrimination.
    *
    * Shape (round-5 upgrade): EXACT duplicates are collapsed before any
    * pairwise scoring. Identical (block, text) documents share every
    * shingle, so each distinct text is scored ONCE through the inverted
    * index (posting frame + codegen'd equi-self-join on (shingle, block)),
    * then group members are expanded back afterwards — cross-group pairs
    * inherit the group pair's (common, jaccard) verbatim, within-group
    * pairs are J=1.0 by construction. On a corpus with duplication factor
    * d this cuts the join's quadratic blowup by d² (measured 116 s → see
    * BASELINE.md on the 10x-duplicated heavy corpus) while being
    * output-identical on any corpus; exact dedup BEFORE near-dup scoring
    * is also the production ordering, so the collapsed path is the shape
    * a 100 TB run takes anyway. `maxDocFreq` keeps its corpus-global
    * semantics: document frequency is the SUM OF GROUP SIZES per shingle,
    * not the distinct-text count. A pathological group (10⁶ identical
    * docs) still implies C(m,2) output pairs — that is the operator's
    * contract; route exact duplicates to [[exactDedup]] first at scale.
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      blockCol: String, threshold: Double, maxDocFreq: Long = 0L,
      fast: Boolean = false, reliable: Boolean = false): DataFrame = {
    // materialized frames are each consumed 2-3 times — rebuilding beats
    // nothing here, and plan truncation keeps the self-join analyzable.
    // Local checkpoints die with their executors, so on a real cluster
    // where the surrounding pipeline cannot simply re-run this stage, pass
    // reliable=true (and set spark.sparkContext.setCheckpointDir) to
    // persist to the checkpoint dir instead (the dupClusters trade-off, as
    // a knob). Storage caveat: unlike local checkpoints (ContextCleaner-
    // reclaimed), reliable checkpoint files are NOT auto-deleted unless
    // spark.cleaner.referenceTracking.cleanCheckpoints=true — a recurring
    // pipeline must set that or clean the dir per batch, or the persisted
    // frames accumulate at O(batches x corpus shingles).
    def materialize(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint(true) else df.localCheckpoint(true)
    // 1. collapse exact duplicates: one representative per (block, text)
    val groups = materialize(docs
      .select(col(idCol).as("doc_id"), col(blockCol).as("block"),
        col(textCol).as("__text"))
      .groupBy(col("block"), md5(col("__text")).as("__tkey"))
      .agg(min(col("doc_id")).as("rep"),
        sort_array(collect_list(col("doc_id"))).as("ids"),
        count(lit(1)).as("gsize"),
        first(col("__text")).as("__text")))
    // 2. inverted index over representatives only
    val sh0 = groups.select(col("rep").as("doc_id"), col("block"),
      col("gsize"), explode(bigramShingles(col("__text"), fast)).as("shingle"))
    val sh = materialize(if (maxDocFreq > 0) {
        // df = sum of group sizes: the cap keeps counting DOCUMENTS, so
        // capped results are identical to the uncollapsed formulation
        val hot = sh0.groupBy("shingle").agg(sum(col("gsize")).as("df"))
          .filter(col("df") > maxDocFreq).select("shingle")
        // deliberately UNHINTED (the applyDedup stance): the hot-shingle set
        // is O(shingles/cap), unbounded on a boilerplate-heavy corpus — a
        // forced broadcast ships it to every executor or OOMs the driver.
        // AQE broadcasts when the runtime size fits the threshold.
        sh0.join(hot, Seq("shingle"), "left_anti")
      } else sh0)
    val n = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val repPairs = sh.as("a")
      .join(sh.as("b"),
        col("a.shingle") === col("b.shingle") &&
          col("a.block") === col("b.block") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("rep_a"), col("b.doc_id").as("rep_b"))
      .agg(count(lit(1)).as("common"))
      .join(n.select(col("doc_id").as("rep_a"), col("n_sh").as("n_a")), "rep_a")
      .join(n.select(col("doc_id").as("rep_b"), col("n_sh").as("n_b")), "rep_b")
      .withColumn("jaccard", round(
        col("common").cast("double") / (col("n_a") + col("n_b") - col("common")), 6))
      .filter(col("jaccard") >= threshold)
    // 3a. expand cross-group pairs: every member of A against every member
    // of B, normalized to doc_a < doc_b; (common, jaccard) carry over since
    // members are byte-identical to their representative
    val cross = repPairs
      .join(groups.select(col("rep").as("rep_a"), col("ids").as("ids_a")), "rep_a")
      .join(groups.select(col("rep").as("rep_b"), col("ids").as("ids_b")), "rep_b")
      .withColumn("x", explode(col("ids_a")))
      .withColumn("y", explode(col("ids_b")))
      .select(least(col("x"), col("y")).as("doc_a"),
        greatest(col("x"), col("y")).as("doc_b"),
        col("common"), col("jaccard"))
    // 3b. within-group pairs: J = 1.0 exactly; the join with n drops groups
    // whose representative has no (surviving) shingles — identical to the
    // uncollapsed formulation, where such docs never enter the index
    if (threshold > 1.0) return cross.select("doc_a", "doc_b", "common", "jaccard")
    val within = groups.filter(col("gsize") >= 2)
      .join(n.select(col("doc_id").as("rep"), col("n_sh")), "rep")
      .select(explode(pairwise(col("ids"), (x, y) =>
        struct(x.as("doc_a"), y.as("doc_b")))).as("p"), col("n_sh"))
      .select(col("p.doc_a"), col("p.doc_b"), col("n_sh").as("common"),
        lit(1.0).as("jaccard"))
    cross.unionByName(within).select("doc_a", "doc_b", "common", "jaccard")
  }

  /** k seeded-md5 MinHash signature columns mh1..mhk.
    *
    * `fast = true` computes all k signatures in ONE traversal of the
    * shingle array via the native `graft_minhash` expression
    * (graft.functions.MinHashSigs — requires `GraftFunctions.register`):
    * identical bytes, but the default composable form evaluates k
    * interpreted lambda trees per shingle (higher-order function bodies
    * are not code-generated), which at production signature widths
    * (k = 64-128) is the whole cost of the signature stage.
    */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
      k: Int, fast: Boolean = false, extraCols: Seq[String] = Nil): DataFrame =
    if (fast) {
      val sig = graft.functions.GraftFunctions.minhash(
        bigramShingles(col(textCol), fast = true), k)
      docs.select(col(idCol).as("doc_id") +: extraCols.map(col) ++:
        (1 to k).map(i => element_at(sig, lit(i)).as(s"mh$i")): _*)
    } else {
      val sigs = (1 to k).map(i =>
        array_min(transform(bigramShingles(col(textCol)),
          x => md5(concat(lit(i.toString), x)))).as(s"mh$i"))
      docs.select(col(idCol).as("doc_id") +: extraCols.map(col) ++: sigs: _*)
    }

  /** Production-scale MinHash (Broder's estimator): ONE md5 digest per
    * shingle, k universal-hash permutations of the truncated digest —
    * k× fewer digest computations than the seeded-md5 form, the version a
    * 100 TB dedup runs at k = 64-128. Signature values are longs (cheaper
    * to band/compare than 32-char hex strings). Requires
    * `GraftFunctions.register`; coefficients are deterministic and
    * engine-reproducible (graft.functions.MinHashUtil.aCoef/bCoef).
    */
  def minhashSignaturesUniversal(docs: DataFrame, idCol: String,
      textCol: String, k: Int): DataFrame = {
    val sig = graft.functions.GraftFunctions.minhashU(
      bigramShingles(col(textCol), fast = true), k)
    docs.select(col(idCol).as("doc_id") +:
      (1 to k).map(i => element_at(sig, lit(i)).as(s"mh$i")): _*)
  }

  /** (doc_id, bucket) rows: one banded-minhash bucket id per band per doc. */
  private def lshBandBuckets(docs: DataFrame, idCol: String, textCol: String,
      bands: Int, rowsPerBand: Int, fast: Boolean,
      extraCols: Seq[String] = Nil): DataFrame = {
    val k = bands * rowsPerBand
    val sigs = minhashSignatures(docs, idCol, textCol, k, fast, extraCols)
    val bandCols = (0 until bands).map { b =>
      val parts = (1 to rowsPerBand).map(r => col(s"mh${b * rowsPerBand + r}"))
      concat(lit(s"${b + 1}:"), md5(concat(parts: _*)))
    }
    // a doc with <2 tokens has no shingles → null signatures → null band
    // buckets; NULL is a groupBy key, so without this filter every
    // signature-less doc would collapse into one bogus bucket and pair
    // with all the others (the SQL oracle's equi-join drops NULL keys)
    sigs.select(col("doc_id") +: extraCols.map(col) :+
        explode(array(bandCols: _*)).as("bucket"): _*)
      .filter(col("bucket").isNotNull)
  }

  /** Band-bucket postings of a document frame — (doc_id, bucket), one row
    * per band per shingled document: the SIGNATURE STORE incremental
    * cluster maintenance persists between batches (see [[mergeClusters]]).
    * Bucket ids are band-prefixed, so equal buckets always mean the same
    * band — identical to the pairing key [[minhashLshPairs]] uses.
    * Signature-less docs (< 2 tokens) emit no rows, mirroring the
    * NULL-key drop of the SQL oracle's equi-join.
    */
  def bandPostings(docs: DataFrame, idCol: String, textCol: String,
      bands: Int, rowsPerBand: Int, fast: Boolean = false): DataFrame =
    lshBandBuckets(docs, idCol, textCol, bands, rowsPerBand, fast)

  /** Incremental duplicate-cluster maintenance (r13) — the operator that
    * makes dd56's "clusters are maintained, never rebuilt per split"
    * production shape real: fold ONE new batch of documents into an
    * existing (doc_id, cluster_id) label store + its [[bandPostings]]
    * signature store, and get back labels IDENTICAL to a from-scratch
    * [[dupClusters]] over everything ingested so far (set-exact, because
    * LSH bucket membership is per-document arithmetic — a pair exists iff
    * the two docs share a band bucket, regardless of WHEN each arrived, so
    * batch-internal pairs + batch-cross-store pairs over all batches
    * enumerate exactly the full run's pair set).
    *
    * Per-batch cost is BATCH-proportional, never corpus-proportional:
    *  - the batch's postings probe the signature store with one
    *    bucket-keyed join (the inverted-index probe — only co-bucketed
    *    rows survive);
    *  - prior connectivity enters as STAR edges (member → canonical) of
    *    AFFECTED clusters only — clusters incident to a new pair — so the
    *    pointer-jumping relabel runs on new pairs + touched members, a
    *    graph the size of the batch's blast radius. Untouched clusters'
    *    labels pass through without a shuffle beyond the anti-join cut.
    *  - label correctness needs no global pass: every affected cluster
    *    contributes all its members via stars, so the merged component's
    *    minimum id is the global minimum.
    *
    * @param existingLabels   (doc_id, cluster_id) from prior batches
    *                         (empty frame for the first)
    * @param existingPostings (doc_id, bucket) signature store of ALL
    *                         prior docs
    * @param batch            the new documents (ids disjoint from prior)
    * @return (updated labels over everything ingested, the batch's
    *         postings — append them to the store)
    */
  def mergeClusters(existingLabels: DataFrame, existingPostings: DataFrame,
      batch: DataFrame, idCol: String, textCol: String,
      bands: Int, rowsPerBand: Int, fast: Boolean = false,
      maxIter: Int = 20): (DataFrame, DataFrame) = {
    // three consumers (internal pairs, cross probe, the returned store
    // rows) — materialize so the k-digest signature stage runs once
    val newPost = bandPostings(batch, idCol, textCol, bands, rowsPerBand,
      fast).localCheckpoint(false)
    val internal = newPost.select(col("doc_id").as("doc_a"), col("bucket"))
      .join(newPost.select(col("doc_id").as("doc_b"), col("bucket")),
        "bucket")
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
    val cross = newPost
      .join(existingPostings.select(col("doc_id").as("doc_o"),
        col("bucket")), "bucket")
      .filter(col("doc_id") =!= col("doc_o"))
      .select(least(col("doc_id"), col("doc_o")).as("doc_a"),
        greatest(col("doc_id"), col("doc_o")).as("doc_b"))
    val pairs = internal.union(cross).distinct().localCheckpoint(false)
    // blast radius: clusters incident to any pair endpoint; their FULL
    // membership re-labels, everything else passes through. The joins are
    // deliberately unhinted (the applyDedup economics — the touched set is
    // batch-bounded but adversarially could be large; AQE decides).
    val ends = pairs.select(col("doc_a").as("doc_id"))
      .union(pairs.select(col("doc_b").as("doc_id"))).distinct()
    val touched = existingLabels.join(ends, "doc_id")
      .select("cluster_id").distinct()
    val affected = existingLabels.join(touched, "cluster_id")
    val starEdges = affected.filter(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id").as("doc_a"), col("cluster_id").as("doc_b"))
    val relabeled = dupClusters(pairs.unionByName(starEdges), maxIter)
    val untouched = existingLabels.join(touched, Seq("cluster_id"),
      "left_anti")
    (untouched.select("doc_id", "cluster_id").unionByName(relabeled),
      newPost)
  }

  /** LSH candidate pairs from banded minhash signatures: signatures are
    * computed once, exploded to (band, bucket) rows, and pairs expand
    * LOCALLY inside each bucket group after one shuffle (no self-join — see
    * graft.queries.Dedup.dd33 scaladoc for why that shape matters).
    * `rowsPerBand` consecutive signature columns hash into one band bucket.
    *
    * `maxBucketSize` (0 = off) is the 100 TB safety knob, mirroring
    * ngramJaccardPairs' `maxDocFreq`: a degenerate bucket (boilerplate-heavy
    * corpus collapsing to one signature) would otherwise accumulate an
    * unbounded id list in one task and expand quadratically. Oversize
    * buckets are dropped BEFORE the collect (an unhinted anti-join against
    * the oversize-bucket set — AQE broadcasts it only when its runtime size
    * fits, since heavy hitters are O(rows/cap)), never materialized; audit them with
    * [[minhashLshBucketStats]]. Near-dups inside a dropped bucket are by
    * construction near-identical boilerplate — at scale those route to
    * exact dedup on the band hash instead of pairwise scoring.
    */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
      bands: Int, rowsPerBand: Int, maxBucketSize: Long = 0L,
      fast: Boolean = false): DataFrame = {
    // round-5 collapse (the simhashNearPairs treatment): identical texts
    // share every signature and hence every band bucket, so signatures —
    // k digests per shingle, the dominant cost — are computed once per
    // DISTINCT text, with the member-id array riding through the banding.
    // Cross-group pairs explode the two arrays where the bucket already
    // co-located them; within-group pairs fall out of each surviving
    // bucket row (so the bucket cap and the null-signature filter gate
    // them exactly as the uncollapsed form did); the final distinct()
    // dedups multi-band emissions as before. No join is introduced.
    // the banding frame feeds two consumers (cross + within; three with
    // the cap census) under different shuffle boundaries — lazily
    // checkpoint-materialize so the signature stage (k digests per
    // shingle) runs once, not once per branch (the tokenBudget pattern)
    val bandsDf = lshBandBuckets(textGroups(docs, idCol, textCol), "rep",
      "__text", bands, rowsPerBand, fast, extraCols = Seq("ids"))
      .localCheckpoint(false)
    val capped =
      if (maxBucketSize > 0) {
        // the cap keeps counting DOCUMENTS (sum of member counts), so
        // capped results are identical to the uncollapsed formulation
        val oversize = bandsDf.groupBy("bucket")
          .agg(sum(size(col("ids"))).as("n"))
          .filter(col("n") > maxBucketSize).select("bucket")
        // unhinted: the oversize-bucket set is O(rows/cap), not bounded —
        // AQE broadcasts it only when its runtime size fits (applyDedup stance)
        bandsDf.join(oversize, Seq("bucket"), "left_anti")
          .localCheckpoint(false)
      } else bandsDf
    val cross = capped.groupBy("bucket")
      .agg(sort_array(collect_list(struct(col("doc_id"), col("ids")))).as("xs"))
      .filter(size(col("xs")) > 1)
      .select(explode(pairwise(col("xs"), (x, y) =>
        struct(x.getField("ids").as("ids_a"),
          y.getField("ids").as("ids_b")))).as("p"))
      .select(explode(col("p.ids_a")).as("x"), col("p.ids_b"))
      .select(col("x"), explode(col("ids_b")).as("y"))
      .select(least(col("x"), col("y")).as("doc_a"),
        greatest(col("x"), col("y")).as("doc_b"))
    val within = capped.filter(size(col("ids")) >= 2)
      .select(explode(pairwise(col("ids"), (x, y) =>
        struct(x.as("doc_a"), y.as("doc_b")))).as("p"))
      .select(col("p.doc_a"), col("p.doc_b"))
    cross.unionByName(within).distinct()
  }

  /** Duplicate-cluster formation: connected components over a near-dup
    * pair frame (doc_a, doc_b), labeling every member with the minimum doc
    * id reachable through the pair graph — the cluster's canonical id.
    * This is the step that turns pairwise candidates into the actual dedup
    * decision (keep canonical, drop the rest).
    *
    * Algorithm: iterative min-label propagation WITH pointer jumping —
    * each round a node takes the min of its own label, its neighbors'
    * labels (the round's one pass over the edge frame), and its label's
    * label (a label-frame self-join: the path-halving step). Neighbor
    * propagation alone needs O(diameter) rounds — a 4000-node near-dup
    * chain would blow any iteration budget; the label-of-label shortcut
    * doubles the jump distance per round, giving O(log diameter)
    * convergence (the hash-to-min construction). The loop is
    * driver-controlled like every iterative graph algorithm on Spark
    * (GraphX Pregel does the same); per-round work is fully distributed,
    * the driver only checks the convergence counter. `maxIter` bounds
    * adversarial graphs.
    *
    * Edge-frame shape, sized for the 100 TB point where edges >> nodes:
    * the frame is pre-partitioned AND pre-sorted on `src` ONCE at
    * materialization (checkpointing preserves the physical partitioning
    * and ordering through `LogicalRDD`), so every round's neighbor join
    * exchanges and sorts only the label frame — the multi-billion-row edge
    * side never crosses the wire again. Duplicate edges are NOT removed:
    * min-aggregation is insensitive to them and partial aggregation
    * absorbs them map-side, so a `distinct` would spend a full-width
    * shuffle to buy nothing.
    *
    * Each round's labels are CHECKPOINTED, not merely cached: the round's
    * logical plan references the previous labels twice (directly and via
    * the neighbor aggregate), so without truncating the logical lineage the
    * analyzed plan doubles every round — 2^rounds analysis cost and heap,
    * the classic iterative-on-Catalyst failure (GraphX checkpoints for the
    * same reason). `localCheckpoint` truncates to the materialized RDD;
    * superseded checkpoints are unreferenced and cleaned by the
    * ContextCleaner. On a cluster, executor loss invalidates local
    * checkpoints — acceptable for a deterministic batch stage that simply
    * re-runs; pass `reliable=true` (with `setCheckpointDir`) if the
    * surrounding pipeline cannot re-run the stage (same knob and caveats
    * as [[ngramJaccardPairs]]).
    */
  def dupClusters(pairs: DataFrame, maxIter: Int = 20,
      reliable: Boolean = false): DataFrame = {
    require(maxIter >= 1, s"maxIter must be >= 1, got $maxIter")
    // r15: the loop interior runs on pre-partitioned RDDs whenever the id
    // type allows it (long ids, the whole registry) — see
    // [[dupClustersRdd]] for why (per-round Catalyst planning measured as
    // 80-90% of the DataFrame loop's wall time). The DataFrame loop below
    // remains the reliable-checkpoint path (RDD reliable checkpoints need
    // a checkpoint dir and re-materialize differently) and the fallback
    // for non-long id types; GRAFT_CC_DF=1 pins it for A/B.
    val longIds = pairs.schema("doc_a").dataType ==
      org.apache.spark.sql.types.LongType &&
      pairs.schema("doc_b").dataType ==
        org.apache.spark.sql.types.LongType
    if (!reliable && longIds && !sys.env.contains("GRAFT_CC_DF"))
      return dupClustersRdd(pairs, maxIter)
    // progress logging for long-running converge loops (off by default):
    // an iterative graph stage with no per-round signal is undebuggable on
    // a cluster — set GRAFT_CC_LOG=1 to see round/changed/seconds on stderr
    val ccLog = sys.env.contains("GRAFT_CC_LOG")
    def logRound(tag: String, t0: Long, extra: => String): Unit = if (ccLog)
      System.err.println(f"[dupClusters] $tag ${(System.nanoTime - t0) / 1e9}%.2fs $extra")
    // Round labels get a LAZY local checkpoint, so the round's convergence
    // count is the one job that both materializes the labels and counts the
    // changes — half the jobs of an eager checkpoint + count. (Reliable
    // checkpoints stay eager: a lazy reliable checkpoint recomputes its RDD
    // when writing to the checkpoint dir.)
    def materializeRound(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint(true) else df.localCheckpoint(false)
    // explicit partition count so AQE cannot coalesce the repartition into
    // a non-hash layout — the preserved HashPartitioning(src, n) is what
    // lets every later round's join skip the edge exchange
    val n = pairs.sparkSession.sessionState.conf.numShufflePartitions
    val tE = System.nanoTime
    // the edge frame is the loop's big resident: COLUMNAR-cache it
    // (compressed, spillable) rather than localCheckpoint it — an RDD
    // checkpoint stores deserialized row objects, several times the
    // columnar footprint, and at high duplication factors that evicts
    // everything else and OOMs the rounds (reproduced at 30x). The cache
    // preserves the repartition+sort layout through InMemoryRelation just
    // as LogicalRDD does, and the edge plan is static across rounds so
    // lineage truncation buys nothing here. Reliable mode keeps the
    // fault-tolerant checkpoint-dir copy instead.
    val edges0 = pairs
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .repartition(n, col("src"))
      .sortWithinPartitions("src")
    val edges = if (reliable) edges0.checkpoint(true) else edges0.persist()
    logRound("edges", tE, s"n=${edges.count()}")
    val tL = System.nanoTime
    // ROUND 1 IS FUSED INTO INITIALIZATION (r15): with identity labels the
    // first round's neighbor-min is a plain min-by-src aggregate over the
    // edge frame (a neighbor's label IS its id) and the pointer-jump is
    // the identity — so instead of materializing an identity label frame
    // and paying round 1's two merge joins, the init computes round 1's
    // exact output, `least(id, min(neighbor))`, in ONE exchange-free
    // aggregate on the pre-partitioned edges (every node appears as src —
    // the frame is symmetric). Labels inherit HashPartitioning(id, n) for
    // the per-round merges as before, updates stay monotone, and the
    // convergence counter starts at 1 — the generic loop below is
    // unchanged and the fixed point is identical (spec: DedupSpec's
    // cluster tests + the dd36/dd58 oracle hashes).
    var labels = materializeRound(edges.groupBy(col("src"))
      .agg(min(col("dst")).as("__nbr"))
      .select(col("src").as("id"),
        least(col("src"), col("__nbr")).as("label")))
    logRound("labels+round1", tL, "fused")
    var converged = false
    var i = 1
    while (!converged && i < maxIter) {
      val tR = System.nanoTime
      // the round's single pass over the edge frame: only the label frame
      // is exchanged/sorted into the join (edges keep their materialized
      // layout); partial aggregation shrinks the min-by-dst shuffle to
      // O(nodes) before it crosses the wire.
      // ALL round joins are merge-hinted: a broadcast build is the one
      // non-spillable driver-heap allocation in the loop, and on a driver
      // already holding the checkpointed edge frame it OOMs before storage
      // evicts (reproduced at 30x duplication: round 2 died building a
      // 150k-row broadcast while ~2 GB of edge blocks sat in storage).
      // Sort-merge with the pre-sorted edge frame is the designed plan —
      // the hint gives up nothing and removes the failure mode.
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "src").hint("merge"), "src")
        .groupBy(col("dst").as("id"))
        .agg(min(col("label")).as("nbr_label"))
      // pointer jumping: each node also sees its label's own label (the
      // path-halving step — one label-frame self-join, fused into the
      // round's single plan). A deeper fused compression is a trap twice
      // over: each extra jump references its input twice, so either the
      // edge-join subplan duplicates 2^jumps-fold (re-executed copies) or
      // an extra materialize job per round pays for itself only on graphs
      // with very long chains — measured slower on both the heavy tier
      // and small-graph workloads.
      val labelOfLabel = labels
        .select(col("id").as("__lid"), col("label").as("__ll"))
      val updated = materializeRound(labels
        .join(labelOfLabel.hint("merge"), col("label") === col("__lid"), "left")
        .join(neighborMin.hint("merge"), Seq("id"), "left")
        .select(col("id"), col("label").as("old_label"),
          least(col("label"),
            coalesce(col("__ll"), col("label")),
            coalesce(col("nbr_label"), col("label"))).as("label")))
      i += 1
      logRound(s"round $i build", tR, "")
      // convergence is checked every SECOND round: the count is the round's
      // only job (it is what materializes the lazy checkpoint), so skipping
      // it on odd rounds folds two rounds of pointer-jumping into one job
      // and halves the per-round scheduling floor — the dominant cost once
      // the loop is floor-bound. Correct because label updates are
      // monotone: a round with zero changes is a fixed point, so "the last
      // round changed nothing" remains an exact stop condition whenever it
      // is evaluated; the price is at most one redundant round after
      // convergence. On skip rounds the unmaterialized lazy checkpoint is
      // computed (and its lineage truncated) inside the next check round's
      // count job.
      if (i % 2 == 0 || i >= maxIter) {
        val changed = updated.filter(col("label") < col("old_label")).count()
        converged = changed == 0
        logRound(s"round $i", tR, s"changed=$changed")
      } else logRound(s"round $i", tR, "deferred")
      labels = updated.drop("old_label")
    }
    // the final label frame is checkpointed (not edge-dependent), so the
    // loop's working set can go; async to not block the caller
    if (!reliable) edges.unpersist(false)
    labels.select(col("id").as("doc_id"), col("label").as("cluster_id"))
  }

  /** [[dupClusters]]'s loop on raw RDDs (r15). Same algorithm — min-label
    * propagation with one pointer-jump per round, convergence counted
    * every second round — and the identical fixed point (the label
    * algebra is `min` over longs in both forms; spec-pinned against the
    * DataFrame loop and the union-find property test, oracle-pinned by
    * dd36/dd58).
    *
    * Why it exists: the DataFrame loop's per-round cost was MEASURED
    * (GRAFT_CC_LOG build/count split, sf0.1, r15) as 0.6-1.3 s of DRIVER
    * plan building per round — every round's `localCheckpoint(lazy)`
    * re-runs analysis/optimization/physical planning over an identical
    * three-join tree while the round's actual count job takes 0.15-0.25 s
    * — the guide §7.3 "driver is planning" signature, paid ~10× per
    * operator call and impossible to amortize from the DataFrame API
    * (Catalyst has no "same plan, new leaf" shortcut). RDD rounds build
    * their DAG in microseconds; the distributed work per round is three
    * node-sized exchanges (neighbor-min with map-side combine, the jump
    * request re-key, the jump reply re-key home), and the edge side never
    * moves: edges are `partitionBy(HashPartitioner(n))`-ed once, packed
    * into primitive long[] pairs per partition (16 bytes/edge resident —
    * below even the serialized-tuple footprint the r15 form chose, with
    * zero per-round deserialization), and every round resolves labels
    * against them via positional zipPartitions (narrow by construction —
    * re-pinned for this form in PlanContractsSpec by dependency type).
    * The loop grain is scale-adaptive: partition count derives from the
    * measured edge count (graft.cc.rowsPerPartition, default 2M edges —
    * ~32 MB packed — per task), capped at spark.sql.shuffle.partitions.
    */
  private def dupClustersRdd(pairs: DataFrame, maxIter: Int): DataFrame = {
    import org.apache.spark.HashPartitioner
    import org.apache.spark.rdd.RDD
    import org.apache.spark.storage.StorageLevel
    val spark = pairs.sparkSession
    import spark.implicits._
    val ccLog = sys.env.contains("GRAFT_CC_LOG")
    def logRound(tag: String, t0: Long, extra: => String): Unit = if (ccLog)
      System.err.println(
        f"[dupClusters/rdd] $tag ${(System.nanoTime - t0) / 1e9}%.2fs $extra")
    val tE = System.nanoTime
    // SCALE-ADAPTIVE loop grain (r16; guide §2.2 "fewer, larger reduce
    // partitions"): the loop's stage count is fixed (~3 exchanges × rounds)
    // but every stage pays a per-task scheduling floor, so running a
    // few-thousand-edge graph at `spark.sql.shuffle.partitions` tasks is
    // pure overhead — measured at sf0.1/32 partitions as ~0.5 s per
    // convergence-check job against ~3k live label rows (GRAFT_CC_LOG).
    // The partition count therefore derives from the MEASURED edge count
    // (graft.cc.rowsPerPartition edges per task, default 2M ≈ 32 MB of
    // serialized long pairs), capped at the session's shuffle partitions —
    // a big graph on a real cluster still gets the full configured
    // parallelism, a small one stops paying 32× floors. The count job
    // materializes the raw edge RDD (the upstream candidate pipeline runs
    // exactly once, same as before — it previously ran inside round 1's
    // first stage), and the partitioned copy replaces it immediately.
    val raw: RDD[(Long, Long)] = pairs
      .select(col("doc_a"), col("doc_b")).as[(Long, Long)].rdd
      .flatMap { case (a, b) => Iterator((a, b), (b, a)) }
      .persist(StorageLevel.MEMORY_AND_DISK_SER)
    val edgeCnt = raw.count()
    val rowsPerPart = spark.conf.getOption("graft.cc.rowsPerPartition")
      .map(_.toLong).filter(_ >= 1).getOrElse(2000000L)
    val confN = spark.sessionState.conf.numShufflePartitions
    val n = math.max(1L, math.min(confN.toLong,
      (edgeCnt + rowsPerPart - 1) / rowsPerPart)).toInt
    val part = new HashPartitioner(n)
    // PACKED edge storage (r16; guide §1.2 per-task work): every round
    // re-reads the whole edge set, and the r15 form paid ~150 ms/round at
    // sf0.1 re-deserializing the MEMORY_AND_DISK_SER boxed (Long, Long)
    // tuples through the join's cogroup (ProfileOne stage table — the
    // `map at TextDedup` stages reading input=50k). The edges now persist
    // DESERIALIZED but packed as two primitive long[] per partition:
    // 16 bytes/edge — SMALLER than the serialized-tuple form (which the
    // r15 loop chose for footprint) — with ZERO per-round deserialization
    // and no cogroup on the edge side. Rounds align to the labels
    // positionally via zipPartitions: partition i of every label
    // generation holds exactly the ids with hash(id) % n == i (round 1
    // emits them from the src-partitioned edges; each merge re-emits its
    // input partition's keys), so no partitioner object is needed and no
    // round moves an edge.
    val edges: RDD[(Array[Long], Array[Long])] = raw
      .partitionBy(part)
      .mapPartitions({ it =>
        var srcs = new Array[Long](1024)
        var dsts = new Array[Long](1024)
        var m = 0
        while (it.hasNext) {
          val e = it.next()
          if (m == srcs.length) {
            srcs = java.util.Arrays.copyOf(srcs, m * 2)
            dsts = java.util.Arrays.copyOf(dsts, m * 2)
          }
          srcs(m) = e._1; dsts(m) = e._2; m += 1
        }
        Iterator.single((java.util.Arrays.copyOf(srcs, m),
          java.util.Arrays.copyOf(dsts, m)))
      }, preservesPartitioning = false)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // materialize the packed copy, then drop the raw one — the loop
    // never holds two edge generations past this point
    edges.foreachPartition(_ => ())
    raw.unpersist(false)
    // fused round 1 (identity labels ⇒ neighbor-min is min(dst) by src,
    // pointer-jump is the identity): src-partitioned edges make it a
    // LOCAL min-by-src — no shuffle at all, and labels come out
    // co-located with the edge partitions for every later zipPartitions
    var withOld: RDD[(Long, (Long, Long))] = edges.mapPartitions({ it =>
      val acc = new LongLongMap()
      it.foreach { case (srcs, dsts) =>
        var j = 0
        while (j < srcs.length) { acc.mergeMin(srcs(j), dsts(j)); j += 1 }
      }
      acc.iterator.map { case (id, m) => (id, (id, math.min(id, m))) }
    }, preservesPartitioning = false)
      .persist(StorageLevel.MEMORY_AND_DISK)
    logRound("edges+round1", tE, s"fused edges=$edgeCnt parts=$n")
    var labels: RDD[(Long, Long)] =
      withOld.mapValues(_._2)
    val superseded = scala.collection.mutable.Buffer[RDD[_]]()
    var converged = false
    var i = 1
    while (!converged && i < maxIter) {
      val tR = System.nanoTime
      val prev = labels
      // neighbor-min: label(src) resolves LOCALLY against the co-located
      // label partition (zipPartitions + primitive map — no cogroup, no
      // edge movement), then ONE combine-shuffle keyed by dst
      val nbrMin = edges.zipPartitions(prev) { (eIt, lIt) =>
        val lab = new LongLongMap()
        lIt.foreach(kv => lab.put(kv._1, kv._2))
        eIt.flatMap { case (srcs, dsts) =>
          new Iterator[(Long, Long)] {
            private var j = 0
            def hasNext: Boolean = j < srcs.length
            def next(): (Long, Long) = {
              val r = (dsts(j), lab.getOrError(srcs(j))); j += 1; r
            }
          }
        }
      }.reduceByKey(part, (a: Long, b: Long) => math.min(a, b))
      // pointer jump: label's label — requests re-key by label value
      // (one shuffle), resolve locally against the label partition that
      // OWNS that id, and the replies re-key home by id (one shuffle; at
      // most one reply per id, so plain partitionBy — no combine needed)
      val jump = prev.map { case (id, lbl) => (lbl, id) }
        .partitionBy(part)
        .zipPartitions(prev) { (rIt, lIt) =>
          val lab = new LongLongMap()
          lIt.foreach(kv => lab.put(kv._1, kv._2))
          rIt.map { case (lbl, id) => (id, lab.getOrError(lbl)) }
        }
        .partitionBy(part)
      // merge: both candidate streams are home-partitioned, so the
      // three-way min is one positional pass re-emitting prev's keys;
      // carrying (old, new) per node keeps the convergence count a
      // narrow filter
      val updated = prev.zipPartitions(nbrMin, jump) { (pIt, nIt, rIt) =>
        val inc = new LongLongMap()
        nIt.foreach(kv => inc.mergeMin(kv._1, kv._2))
        rIt.foreach(kv => inc.mergeMin(kv._1, kv._2))
        pIt.map { case (id, o) =>
          (id, (o, math.min(o, inc.get(id, Long.MaxValue)))) }
      }.persist(StorageLevel.MEMORY_AND_DISK)
      i += 1
      logRound(s"round $i build", tR, "")
      if (i % 2 == 0 || i >= maxIter) {
        val changed = updated.filter { case (_, (o, nw)) => nw < o }.count()
        converged = changed == 0
        // the count materialized `updated`, so everything older is dead —
        // unpersist the superseded rounds (async) to keep the loop's
        // working set at one label generation
        superseded.foreach(_.unpersist(false))
        superseded.clear()
        logRound(s"round $i", tR, s"changed=$changed")
      } else logRound(s"round $i", tR, "deferred")
      superseded += withOld
      withOld = updated
      labels = updated.mapValues(_._2)
    }
    edges.unpersist(false)
    // persist hygiene (r15 verdict #2): at exit the buffer still holds the
    // penultimate label generation — the final labels read from the FINAL
    // generation's materialized cache, so the older one is dead weight and
    // unpersists here. The final generation itself stays persisted for the
    // caller's consumption (a recompute after block loss falls back to
    // lineage, standard semantics); the bench frees it between entries via
    // BenchHarness.unpersistLeaked.
    superseded.foreach(_.unpersist(false))
    superseded.clear()
    spark.createDataset(labels).toDF("doc_id", "cluster_id")
  }

  /** Apply the dedup decision: drop every cluster member except its
    * canonical (minimum-id) representative; documents in no cluster pass
    * through. The anti-join side is deliberately UNHINTED: web-scale dedup
    * routinely removes 30-50% of a corpus, so the duplicate-id set is
    * O(corpus) in the worst case and a forced broadcast would OOM the
    * driver at 100 TB. Left to the planner, AQE broadcasts when the dup
    * set's runtime size fits `spark.sql.autoBroadcastJoinThreshold` and
    * falls back to a shuffled anti-join otherwise — one exchange of bare
    * ids, never of document bodies.
    */
  def applyDedup(docs: DataFrame, idCol: String, clusters: DataFrame): DataFrame = {
    val dupIds = clusters.filter(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id").as(idCol))
    docs.join(dupIds, Seq(idCol), "left_anti")
  }

  /** Eval→train shingle-leakage audit for a split assignment (r12) —
    * the QA read-out that tells you whether a split actually separates:
    * for every eval (non-train) document, how many of its distinct
    * bigram shingles also occur anywhere in the train half, aggregated
    * to one row: eval doc count, docs whose shingle overlap reaches
    * `contaminatedAt` (the memorization-risk class — a near-twin in
    * train), and the corpus-level leak ratio. Run against
    * [[clusterSafeSplit]] vs a naive doc-hash split it quantifies
    * exactly what cluster-unit assignment buys.
    *
    * Scale shape: the train shingle set is CORPUS-sized, so unlike the
    * benchmark-contamination screen (whose benchmark side broadcasts)
    * the eval↔train shingle join is deliberately UNHINTED — AQE
    * broadcasts only if the train set's runtime size fits, else a
    * shuffled join on the shingle key; one exchange of bare shingles.
    * Everything after the per-doc counts is a single aggregate row.
    * The shingled frame is deliberately NOT materialized even though
    * three consumers re-tokenize (the bm25Rank candidate-frame
    * decision): the shingle arrays are corpus-sized, so storing them
    * trades three cheap codegen map passes for a corpus-scale resident
    * intermediate — at 100 TB re-scanning keeps memory flat.
    *
    * Every row is audited on exactly one side: a NULL split value — a
    * partial assignment joined in, corrupt input — is NEVER train and
    * counts as eval (the null-safe `<=>` arm; a null-rejecting `=!=`
    * would silently drop such rows from BOTH sides and a leaky split
    * could audit clean). Conservative by construction: an unassigned
    * document cannot leak INTO train, and it stays in the audited
    * denominator.
    */
  def splitLeakageAudit(split: DataFrame, idCol: String, textCol: String,
      splitCol: String, contaminatedAt: Double = 0.5): DataFrame = {
    require(contaminatedAt > 0 && contaminatedAt <= 1,
      s"contaminatedAt must be in (0, 1], got $contaminatedAt")
    val trainSh = split.filter(col(splitCol) === "train")
      .select(explode(bigramShingles(col(textCol))).as("shingle"))
      .distinct()
    val evalDocs = split.filter(!(col(splitCol) <=> "train"))
      .select(col(idCol).as("doc_id"), bigramShingles(col(textCol)).as("__sh"))
    val shared = evalDocs
      .select(col("doc_id"), explode(col("__sh")).as("shingle"))
      .join(trainSh, Seq("shingle"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
    // null/missing text audits as ZERO shingles (it contributes no rows to
    // the overlap join either) — bare size() would yield -1 (legacy
    // sizeOfNull) or NULL (ANSI) for a null shingle array and DECREMENT
    // eval_shingles, while the oracle's SUM(len(bg)) drops the NULL: the
    // two sides would diverge on any corpus with null text (r12 advice)
    evalDocs.select(col("doc_id"),
        greatest(coalesce(size(col("__sh")), lit(0)), lit(0)).as("n_shingles"))
      .join(shared, Seq("doc_id"), "left")
      .withColumn("n_shared", coalesce(col("n_shared"), lit(0L)))
      .agg(
        count(lit(1)).as("n_eval_docs"),
        sum(when(col("n_shingles") > 0 &&
            col("n_shared").cast("double") >=
              lit(contaminatedAt) * col("n_shingles").cast("double"),
          lit(1L)).otherwise(lit(0L))).as("n_contaminated"),
        sum(col("n_shared")).as("shared_shingles"),
        sum(col("n_shingles").cast("long")).as("eval_shingles"))
      .withColumn("leak_ratio",
        round(col("shared_shingles").cast("double") /
          col("eval_shingles").cast("double"), 6))
  }

  /** Leakage-safe train/val/test split (r12): assign each duplicate
    * CLUSTER — not each document — to a split by the deterministic hash
    * of its canonical id, so near-duplicates can never straddle the
    * train/eval boundary. A document-level random split leaks: with a
    * 10× duplication rate, ~all eval documents have a near-twin in
    * train and the eval loss measures memorization, not generalization
    * — the contamination vector [[dupClusters]] exists to close.
    * Documents in no cluster are their own unit (their id hashes
    * directly), so the split is defined for the whole corpus.
    *
    * The assignment is the [[Sampling.stratified]] 16-bit md5 bucket on
    * the SPLIT KEY (canonical cluster id): stateless, engine-exact,
    * mergeable — re-running after new documents arrive never moves an
    * existing cluster between splits, which is what makes incremental
    * corpus refreshes eval-stable. Scale shape: one key-join of the
    * corpus against the data-sized cluster frame (the [[applyDedup]]
    * economics — AQE broadcasts when the cluster set fits, shuffles
    * bare ids otherwise) plus a stateless projection; no window, no
    * sort, no driver state.
    *
    * @param clusters (doc_id, cluster_id) as produced by [[dupClusters]]
    * @return docs' columns + (split_key, split) where split ∈
    *         {train, val, test}
    */
  def clusterSafeSplit(docs: DataFrame, idCol: String, clusters: DataFrame,
      trainPct: Double, valPct: Double): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 1,
      s"invalid split fractions: train=$trainPct val=$valPct")
    // the output columns would silently SHADOW caller data (withColumn
    // replaces by name), and a caller-side cluster_id would both make the
    // join key ambiguous and be swallowed by a drop-by-name — fail loud
    // instead of corrupting either (r12 advice); the cluster frame's
    // column rides an internal alias so only internal names are dropped
    for (c <- Seq("split_key", "split", "__csplit_cid", "__bkt"))
      require(!docs.columns.contains(c),
        s"clusterSafeSplit: docs already has a '$c' column — rename it " +
          "(the split output and its internals would shadow caller data)")
    val trainThr = (trainPct * 65536).toInt
    val valThr = ((trainPct + valPct) * 65536).toInt
    docs
      .join(clusters.select(col("doc_id").as(idCol),
          col("cluster_id").as("__csplit_cid")),
        Seq(idCol), "left")
      .withColumn("split_key", coalesce(col("__csplit_cid"), col(idCol)))
      .withColumn("__bkt",
        conv(substring(md5(concat(lit("split|"),
          col("split_key").cast("string"))), 1, 4), 16, 10).cast("int"))
      .withColumn("split",
        when(col("__bkt") < trainThr, lit("train"))
          .when(col("__bkt") < valThr, lit("val"))
          .otherwise(lit("test")))
      .drop("__bkt", "__csplit_cid")
  }

  /** The production near-dedup PIPELINE — the composed whole a curation run
    * actually calls: MinHash-LSH candidates → exact Jaccard verification on
    * ONLY the candidate pairs → connected-component clusters → apply.
    * Returns `docs` minus every non-canonical cluster member (the
    * [[applyDedup]] end state, all caller columns preserved). Semantically
    * identical to hand-wiring [[minhashLshPairs]] → Jaccard-filter →
    * [[dupClusters]] → [[applyDedup]] (spec-pinned equality, including
    * under an engaged bucket cap), but with the composition economics a
    * 100 TB run needs:
    *
    *  - ONE [[textGroups]] pass feeds BOTH stages: signatures (k digests
    *    per shingle, the candidate stage's dominant cost) and the
    *    verification shingle sets are computed per DISTINCT text, never per
    *    document. At duplication factor d that is d× less hashing and d²
    *    less verification work than running the stages on raw documents.
    *  - Verification touches CANDIDATES ONLY: each candidate rep pair joins
    *    the two representatives' shingle arrays (two key joins on the
    *    O(candidates) frame) and intersects them locally. Unlike the full
    *    [[ngramJaccardPairs]] inverted index — which scores every
    *    co-blocked pair in the corpus — the scored set here is bounded by
    *    LSH fan-out (bands × bucket population, capped via
    *    `maxBucketSize`), the candidates ≪ corpus regime LSH exists to buy.
    *  - Clustering runs on the REPRESENTATIVE graph (nodes = distinct
    *    texts, edges = verified rep pairs), not the expanded member graph:
    *    byte-identical members share every signature, so their cluster is
    *    their representative's cluster. The member-level labels fall out
    *    join-free afterwards (explode of the member-id arrays already
    *    riding on `groups`), and the canonical id is preserved exactly —
    *    each representative is its group's minimum id, so the component's
    *    minimum representative IS the component's minimum document id.
    *
    * Exact duplicates collapse only when their group survives ≥1 band
    * bucket (with `maxBucketSize = 0` that is always), mirroring the
    * hand-wired chain where within-group J=1 pairs are emitted from
    * surviving buckets — this is what makes the equality exact rather than
    * approximate. A run that wants unconditional exact dedup composes
    * [[exactDedup]] upstream.
    *
    * `reliable` hardens the iterative clustering stage's checkpoints (the
    * [[dupClusters]] knob and caveats); the candidate/verify frames use
    * lazy local checkpoints as in [[minhashLshPairs]].
    */
  def nearDedupPipeline(docs: DataFrame, idCol: String, textCol: String,
      bands: Int, rowsPerBand: Int, threshold: Double,
      maxBucketSize: Long = 0L, maxIter: Int = 20, fast: Boolean = false,
      reliable: Boolean = false): DataFrame = {
    // stage 0: the shared exact-duplicate collapse — one scan of the corpus
    val groups = textGroups(docs, idCol, textCol).localCheckpoint(false)
    // stage 1: banding over representatives only; `ids` rides along unused
    // so the frame is shared with minhashLshPairs' shape (and the bucket
    // cap keeps counting DOCUMENTS via member counts, not groups)
    val bandsDf = lshBandBuckets(groups, "rep", "__text", bands, rowsPerBand,
      fast, extraCols = Seq("ids")).localCheckpoint(false)
    val capped =
      if (maxBucketSize > 0) {
        val oversize = bandsDf.groupBy("bucket")
          .agg(sum(size(col("ids"))).as("n"))
          .filter(col("n") > maxBucketSize).select("bucket")
        // unhinted: oversize-bucket set is O(rows/cap) (applyDedup stance)
        bandsDf.join(oversize, Seq("bucket"), "left_anti")
          .localCheckpoint(false)
      } else bandsDf
    // candidate REP pairs: local in-bucket expansion, no join (the
    // minhashLshPairs plan), distinct across multi-band emissions
    val cand = capped.groupBy("bucket")
      .agg(sort_array(collect_list(col("doc_id"))).as("xs"))
      .filter(size(col("xs")) > 1)
      .select(explode(pairwise(col("xs"), (x, y) =>
        struct(x.as("rep_a"), y.as("rep_b")))).as("p"))
      .select(col("p.rep_a"), col("p.rep_b")).distinct()
    // stage 2: exact verification on candidates only — ship each side's
    // shingle array to the pair (bounded by LSH fan-out) and intersect
    // locally; round(j, 6) matches ngramJaccardPairs' scorer exactly
    val shArr = groups.select(col("rep"),
      bigramShingles(col("__text"), fast).as("__sh"))
    val verified = cand
      .join(shArr.select(col("rep").as("rep_a"), col("__sh").as("__sh_a")), "rep_a")
      .join(shArr.select(col("rep").as("rep_b"), col("__sh").as("__sh_b")), "rep_b")
      .withColumn("__common", size(array_intersect(col("__sh_a"), col("__sh_b"))))
      .withColumn("__union",
        size(col("__sh_a")) + size(col("__sh_b")) - col("__common"))
      .filter(col("__union") > 0 &&
        round(col("__common").cast("double") / col("__union"), 6) >= threshold)
      .select(col("rep_a").as("doc_a"), col("rep_b").as("doc_b"))
    // stage 3: connected components over the rep graph (nodes = distinct
    // texts — the d²-smaller graph)
    val repClusters = dupClusters(verified, maxIter, reliable)
    // stage 4: member-level canonical = the rep's cluster label (or the rep
    // itself when unclustered), for groups with >= 1 surviving bucket row;
    // groups fully dropped by the cap produced no pairs and pass through
    val survivors = capped.select(col("doc_id").as("rep")).distinct()
    val canon = survivors
      .join(repClusters.withColumnRenamed("doc_id", "rep"), Seq("rep"), "left")
      .select(col("rep"), coalesce(col("cluster_id"), col("rep")).as("__canon"))
    val dupIds = groups.join(canon, Seq("rep"))
      .select(explode(col("ids")).as(idCol), col("__canon"))
      .filter(col(idCol) =!= col("__canon"))
      .select(col(idCol))
    // unhinted anti-join: the duplicate-id set is O(corpus) (applyDedup)
    docs.join(dupIds, Seq(idCol), "left_anti")
  }

  /** Incremental dedup of a NEW batch against an existing REFERENCE corpus
    * — the production ingest path: the reference is already deduplicated
    * and indexed; each arriving batch must drop documents that are exact
    * or near duplicates OF THE REFERENCE, without re-scoring the reference
    * against itself. Returns the surviving batch rows (all caller
    * columns). Batch-internal duplicates are deliberately NOT collapsed
    * here — run [[nearDedupPipeline]] on the surviving batch for that;
    * separating the two keeps this operator's cost proportional to the
    * BATCH, not the corpus.
    *
    * Stages (each stage only ever shuffles digests/ids/shingle arrays of
    * the BATCH side; the reference side contributes the three
    * [[ReferenceDedupIndex]] frames, built from one textGroups pass within
    * this call — callers screening MANY batches must build the index once
    * with [[buildReferenceIndex]] and call [[dedupAgainstIndex]] per batch,
    * which is what st50's ingest loop does):
    *
    *  1. exact screen — anti-join of batch md5 digests against reference
    *     digests (unhinted: the reference digest set is O(corpus));
    *  2. LSH candidates — band buckets for both sides' DISTINCT texts
    *     ([[textGroups]] collapse on each side), joined on the bucket id.
    *     Unlike the within-corpus generators (which expand pairs inside a
    *     bucket group and need no join), the cross-corpus candidate set IS
    *     a join — batch buckets against reference buckets — and stays
    *     bounded by bucket populations (`maxBucketSize` caps the COMBINED
    *     population, counting documents on both sides);
    *  3. exact Jaccard verify on candidates only (the [[nearDedupPipeline]]
    *     array-intersect form, round(j,6) >= threshold);
    *  4. expand — drop every member of a batch group whose representative
    *     matched any reference representative.
    *
    * Null-text rows survive (they never digest-match and never band); a
    * null-text reference row likewise screens nothing.
    */
  def dedupAgainstReference(ref: DataFrame, batch: DataFrame, idCol: String,
      textCol: String, bands: Int, rowsPerBand: Int, threshold: Double,
      maxBucketSize: Long = 0L, fast: Boolean = false): DataFrame =
    dedupAgainstIndex(
      buildReferenceIndex(ref, idCol, textCol, bands, rowsPerBand, fast),
      batch, idCol, textCol, threshold, maxBucketSize)

  /** Prebuilt reference-side index for [[dedupAgainstIndex]]: the three
    * frames the screen consumes (content digests, LSH band buckets,
    * per-representative shingle arrays), each derived from ONE
    * [[textGroups]] pass over the reference and lazily local-checkpointed
    * — so the reference corpus is scanned and its grouping shuffle paid
    * ONCE when the first batch materializes the index, and every later
    * batch (and every stream micro-batch — st50) reads the materialized
    * partitions instead of re-grouping a 100 TB corpus per call (r6
    * verdict #2: the previous form rebuilt all three per invocation).
    * Banding parameters ride along so a batch cannot be screened with a
    * mismatched banding scheme. A production pipeline would persist these
    * frames as parquet and rebuild on corpus compaction; the checkpoint
    * form is the in-session equivalent.
    */
  final case class ReferenceDedupIndex(digests: DataFrame,
      bandBuckets: DataFrame, shingles: DataFrame,
      bands: Int, rowsPerBand: Int, fast: Boolean)

  /** Build the [[ReferenceDedupIndex]] for a reference corpus. Lazy: no
    * job runs until the first screening batch needs a frame.
    */
  def buildReferenceIndex(ref: DataFrame, idCol: String, textCol: String,
      bands: Int, rowsPerBand: Int, fast: Boolean = false): ReferenceDedupIndex = {
    val rGroups = textGroups(ref, idCol, textCol).localCheckpoint(false)
    // distinct digests fall out of the grouping — and the grouping KEY
    // (__tkey) already IS md5(__text), so reuse it instead of re-hashing
    // every distinct text's full body; the null-text group carries a null
    // key, which an equi-join can never match — same semantics as the
    // md5+distinct this replaces
    val digests = rGroups.select(col("__tkey").as("__fp"))
      .localCheckpoint(false)
    val rBands = lshBandBuckets(rGroups, "rep", "__text", bands, rowsPerBand,
      fast, extraCols = Seq("ids"))
      .select(col("doc_id").as("r_rep"),
        col("ids").as("__r_ids"), col("bucket"))
      .localCheckpoint(false)
    val rSh = rGroups.select(col("rep").as("r_rep"),
      bigramShingles(col("__text"), fast).as("__sh_r"))
      .localCheckpoint(false)
    ReferenceDedupIndex(digests, rBands, rSh, bands, rowsPerBand, fast)
  }

  /** [[dedupAgainstReference]] against a prebuilt [[ReferenceDedupIndex]]
    * — the form a streaming ingest loop calls per micro-batch: only the
    * BATCH side is scanned, grouped and banded per call.
    */
  def dedupAgainstIndex(index: ReferenceDedupIndex, batch: DataFrame,
      idCol: String, textCol: String, threshold: Double,
      maxBucketSize: Long = 0L): DataFrame = {
    val bands = index.bands; val rowsPerBand = index.rowsPerBand
    val fast = index.fast
    // 1. exact screen on content digests
    val fresh = batch.withColumn("__fp", md5(col(textCol)))
      .join(index.digests, Seq("__fp"), "left_anti").drop("__fp")
    // 2. band buckets over the batch side's distinct texts; the reference
    //    side's buckets come prebuilt from the index
    val bGroups = textGroups(fresh, idCol, textCol).localCheckpoint(false)
    val bBands = lshBandBuckets(bGroups, "rep", "__text", bands, rowsPerBand,
      fast, extraCols = Seq("ids"))
      .select(col("doc_id").as("b_rep"), col("ids"), col("bucket"))
    val rBands = index.bandBuckets
    val (bCapped, rCapped) =
      if (maxBucketSize > 0) {
        // combined population, counting documents (sum of member counts on
        // both sides) — the degenerate-boilerplate guard, same stance as
        // minhashLshPairs; the oversize set is unbounded, so unhinted
        val oversize = bBands.select(col("bucket"), size(col("ids")).as("__n"))
          .unionByName(rBands.select(col("bucket"), size(col("__r_ids")).as("__n")))
          .groupBy("bucket").agg(sum(col("__n")).as("__tot"))
          .filter(col("__tot") > maxBucketSize).select("bucket")
        (bBands.join(oversize, Seq("bucket"), "left_anti"),
          rBands.join(oversize, Seq("bucket"), "left_anti"))
      } else (bBands, rBands)
    val cand = bCapped.join(rCapped, "bucket")
      .select("b_rep", "r_rep").distinct()
    // 3. verify on candidates only; reference shingles come from the index
    val bSh = bGroups.select(col("rep").as("b_rep"),
      bigramShingles(col("__text"), fast).as("__sh_b"))
    val matchedReps = cand
      .join(bSh, "b_rep").join(index.shingles, "r_rep")
      .withColumn("__common", size(array_intersect(col("__sh_b"), col("__sh_r"))))
      .withColumn("__union",
        size(col("__sh_b")) + size(col("__sh_r")) - col("__common"))
      .filter(col("__union") > 0 &&
        round(col("__common").cast("double") / col("__union"), 6) >= threshold)
      .select(col("b_rep")).distinct()
    // 4. expand matched groups to member ids, anti-join (unhinted — the
    // near-dup id set is O(batch) on a redundant feed)
    val dupIds = bGroups.join(matchedReps, col("rep") === col("b_rep"))
      .select(explode(col("ids")).as(idCol))
    fresh.join(dupIds, Seq(idCol), "left_anti")
  }

  /** Cross-document exact-substring span removal (the Spark-native form
    * of Lee et al. 2021, arXiv:2107.06499 "Deduplicating Training Data
    * Makes Language Models Better", which removes repeated ≥50-token
    * substrings via a corpus suffix array): every token covered by an
    * `n`-token window whose content appears in at least `minDocs`
    * DISTINCT documents is dropped, and each document's surviving tokens
    * are reassembled in order. The granularity the other dedup operators
    * miss — document-level ([[exactDedup]]/[[nearDedupPipeline]]) keeps a
    * whole near-copy, line-level ([[lineDedup]]) only catches repeats
    * that align to line boundaries; this catches boilerplate SPANS inside
    * otherwise-unique prose. Returns (idCol, textCol cleaned — empty
    * string when everything was repeated, rows never dropped,
    * n_removed).
    *
    * Note the Lee semantics: ALL copies of a repeated span are removed
    * (there is no canonical keeper) — run [[exactDedup]] first, as a
    * production pipeline does, so full-document duplicates don't vaporize
    * both copies.
    *
    * Scale shape (the [[lineDedup]] economics at token-window grain): ONE
    * prep frame per document — (doc_id, digest array, text), the
    * whole-text split and the window digesting each computed exactly once
    * — is lazily checkpoint-materialized and feeds every downstream pass;
    * the hot-window set is O(windows/minDocs), unbounded on
    * template-heavy corpora, so it joins back UNHINTED (AQE broadcasts
    * only when the runtime size fits); each document's hot-window START
    * positions collect into one int array (partial-aggregated map-side,
    * O(hits) ints total), and the coverage arithmetic + reassembly run as
    * ONE per-document two-pointer sweep ([[graft.functions.StripSpans]]
    * — registered by this call, spec-pinned identical to the relational
    * explode/anti-join/rebuild form it replaces, which shuffled hits×n
    * position rows plus every surviving token: ≈1.2B intermediate rows
    * and the measured memory-band thrash at the factor-30 heavy corpus).
    * Total: two corpus-token-linear shuffles (census, hot semi-join) plus
    * two doc-count-row exchanges (starts groupBy, prep join).
    */
  def substringDedup(docs: DataFrame, idCol: String, textCol: String,
      n: Int, minDocs: Long = 2L, fast: Boolean = false): DataFrame = {
    require(n >= 1, s"window length must be >= 1 token, got $n")
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val base = docs.select(col(idCol).as("doc_id"), col(textCol).as("__text"))
      .withColumn("__tk", split(col("__text"), " "))
    // `fast` computes the window digests in one fused codegen loop
    // (graft_ngram_digests — identical output, spec-pinned parity); the
    // composable form interprets a lambda and allocates a slice + joined
    // string PER WINDOW, which is the dominant cost of the whole operator
    // at corpus scale.
    // sequence(1, m) DESCENDS when m < 1 — guard short docs to no windows
    val windowDigests =
      if (fast) graft.functions.GraftFunctions.ngramDigests(col("__text"), n)
      else when(size(col("__tk")) >= n,
        transform(sequence(lit(1), size(col("__tk")) - n + 1),
          j => md5(array_join(slice(col("__tk"), j, lit(n)), " "))))
        .otherwise(array().cast("array<string>"))
    val prep = base
      .select(col("doc_id"), windowDigests.as("__ws"), col("__text"))
      .localCheckpoint(false)
    val win = prep
      .select(col("doc_id"), posexplode(col("__ws")).as(Seq("__p0", "__h")))
    val hot = win.groupBy("__h")
      .agg(countDistinct(col("doc_id")).as("__df"))
      .filter(col("__df") >= minDocs).select("__h")
    val starts = win.join(hot, Seq("__h"), "left_semi")
      .groupBy("doc_id").agg(collect_list(col("__p0")).as("__starts"))
    val stripped = graft.functions.GraftFunctions.stripSpans(col("__text"),
      coalesce(col("__starts"), array().cast("array<int>")), n)
    prep.join(starts, Seq("doc_id"), "left")
      .select(col("doc_id"), stripped.as("__s"))
      .select(col("doc_id").as(idCol),
        col("__s.text").as(textCol),
        col("__s.n_removed").as("n_removed"))
  }

  /** Audit companion to [[minhashLshPairs]]: per-bucket population and
    * whether the cap would drop it — the "dropped bucket" metric a 100 TB
    * run monitors (dropped buckets ⇒ candidate recall loss on boilerplate).
    */
  def minhashLshBucketStats(docs: DataFrame, idCol: String, textCol: String,
      bands: Int, rowsPerBand: Int, maxBucketSize: Long,
      fast: Boolean = false): DataFrame =
    // same collapsed banding as minhashLshPairs, so the audit costs what
    // the operator it monitors costs; bucket_size keeps DOCUMENT-count
    // semantics via the member arrays
    lshBandBuckets(textGroups(docs, idCol, textCol), "rep", "__text",
      bands, rowsPerBand, fast, extraCols = Seq("ids"))
      .groupBy("bucket").agg(sum(size(col("ids"))).as("bucket_size"))
      .withColumn("dropped",
        lit(maxBucketSize > 0) && col("bucket_size") > maxBucketSize)

  /** SimHash fingerprint: per-token md5-derived `bits`-bit hash, each bit
    * votes ±1 weighted by token frequency. Token hashes come from the
    * first max(4, ceil(bits/4)) hex chars of md5 — the 4-char floor keeps
    * every width <= 16 bit-identical to the original 16-bit-only
    * implementation (a narrower prefix would re-map bit j to different
    * md5 bits and silently change persisted fingerprints). At the
    * production width (64) the hash is assembled from two 32-bit halves
    * into a SIGNED long — bit 63 is the sign bit, exactly the wire format
    * `bit_count(a ^ b)` Hamming arithmetic expects; the SQL oracle
    * reproduces the same signed value.
    */
  def simhash(docs: DataFrame, idCol: String, textCol: String, bits: Int): DataFrame = {
    require(bits >= 1 && bits <= 64, s"simhash supports 1..64 bits, got $bits")
    val hexChars = math.max(4, (bits + 3) / 4)
    val tok = docs.select(col(idCol).as("doc_id"), explode(toks(col(textCol))).as("t"))
      .withColumn("__md5", md5(col("t")))
    val th =
      if (hexChars <= 15) // fits a signed long directly
        conv(substring(col("__md5"), 1, hexChars), 16, 10).cast("long")
      else { // 16 hex chars = 64 bits: conv-to-string would overflow the
        // signed cast, so assemble from two 32-bit halves (shiftleft wraps
        // into the sign bit, which is the intended two's-complement value)
        val hi = conv(substring(col("__md5"), 1, 8), 16, 10).cast("long")
        val lo = conv(substring(col("__md5"), 9, 8), 16, 10).cast("long")
        shiftleft(hi, 32).bitwiseOR(lo)
      }
    val hashed = tok.withColumn("th", th)
    val sums = (0 until bits).map(j =>
      sum(when(shiftright(col("th"), j).bitwiseAND(lit(1L)) === 1, 1).otherwise(-1))
        .as(s"s$j"))
    val fingerprint = (0 until bits)
      .map(j => when(col(s"s$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
    val out = if (bits <= 16) fingerprint.cast("int") else fingerprint.cast("long")
    hashed.groupBy("doc_id")
      .agg(sums.head, sums.tail: _*)
      .select(col("doc_id"), out.as("simhash"))
  }

  /** SimHash Hamming near-dup pairs at the production 64-bit width,
    * blocked Manku-style: the fingerprint splits into four 16-bit chunks;
    * by pigeonhole any pair within Hamming distance `maxHamming` <= 3
    * agrees on at least one chunk, so candidates are generated per
    * (chunk index, chunk value) bucket — ONE shuffle, local pair expansion
    * inside each bucket (the minhashLshPairs shape), never an all-pairs
    * join — then exact-filtered with `bit_count(a ^ b)`. At 100 TB the
    * chunk id is the layout key, and `maxBucketSize` (0 = off) is the
    * same degenerate-bucket guard as minhashLshPairs': a boilerplate
    * corpus collapsing to one fingerprint would otherwise accumulate an
    * unbounded id list in one task; oversize buckets are anti-joined away
    * before the collect, and their members — near-identical by
    * construction — belong in exact dedup on the fingerprint instead.
    */
  def simhashNearPairs(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, maxBucketSize: Long = 0L): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"4x16-bit chunking guarantees recall only for maxHamming <= 3, got $maxHamming")
    // round-5 collapse (the ngramJaccardPairs treatment): identical texts
    // share a fingerprint and identical fingerprints share every chunk
    // bucket, so each DISTINCT fingerprint goes through the chunk-blocked
    // index once, with its member-id array riding along — on a corpus with
    // duplication factor d the in-bucket quadratic expansion shrinks d².
    // No join is introduced: cross-group pairs explode the two id arrays
    // where the bucket already co-located them, within-group pairs
    // (hamming 0) fall out of each surviving bucket row — which makes the
    // bucket cap gate them exactly as the uncollapsed form did — and the
    // final distinct() dedups multi-bucket emissions as before.
    val groups = simhash(docs, idCol, textCol, bits = 64)
      .groupBy(col("simhash"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
    val chunks = (0 until 4).map(i =>
      concat(lit(s"$i:"),
        shiftright(col("simhash"), i * 16).bitwiseAND(lit(0xFFFFL))))
    // two consumers (cross + within; three with the cap census) — lazily
    // checkpoint-materialize so the per-token fingerprint aggregation runs
    // once, not once per branch
    val buckets0 = groups.select(col("simhash"), col("ids"),
      explode(array(chunks: _*)).as("bucket"))
      .localCheckpoint(false)
    val buckets =
      if (maxBucketSize > 0) {
        // the cap keeps counting DOCUMENTS (sum of member counts), so
        // capped results are identical to the uncollapsed formulation
        val oversize = buckets0.groupBy("bucket")
          .agg(sum(size(col("ids"))).as("n"))
          .filter(col("n") > maxBucketSize).select("bucket")
        // unhinted: O(rows/cap) heavy-hitter set — AQE sizes the join
        buckets0.join(oversize, Seq("bucket"), "left_anti")
          .localCheckpoint(false)
      } else buckets0
    val cross = buckets.groupBy("bucket")
      .agg(sort_array(collect_list(struct(col("simhash"), col("ids")))).as("xs"))
      .filter(size(col("xs")) > 1)
      .select(explode(pairwise(col("xs"), (x, y) =>
        struct(x.getField("ids").as("ids_a"),
          y.getField("ids").as("ids_b"),
          x.getField("simhash").as("fp_a"),
          y.getField("simhash").as("fp_b")))).as("p"))
      .select(explode(col("p.ids_a")).as("x"), col("p.ids_b"),
        col("p.fp_a"), col("p.fp_b"))
      .select(col("x"), explode(col("ids_b")).as("y"),
        col("fp_a"), col("fp_b"))
      .select(least(col("x"), col("y")).as("doc_a"),
        greatest(col("x"), col("y")).as("doc_b"),
        bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).as("hamming"))
    // hamming written as fp^fp (not a 0 literal) so a null fingerprint
    // group yields null and is filtered — byte-identical to the
    // uncollapsed form's null semantics
    val within = buckets.filter(size(col("ids")) >= 2)
      .select(explode(pairwise(col("ids"), (x, y) =>
        struct(x.as("doc_a"), y.as("doc_b")))).as("p"),
        bit_count(col("simhash").bitwiseXOR(col("simhash"))).as("hamming"))
      .select(col("p.doc_a"), col("p.doc_b"), col("hamming"))
    cross.unionByName(within)
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Directional n-gram CONTAINMENT pairs — the quote/subset detector
    * resemblance misses: containment(A→B) = |A∩B| / |A| is high when A's
    * shingles live inside B even if B is far larger (a doc quoting
    * another, a page embedding a boilerplate block), exactly where
    * Jaccard collapses toward |A|/|B|. Emits both directions per pair
    * plus the shared count, keeping pairs where EITHER direction clears
    * `threshold`. Same blocked inverted-index economics as
    * [[ngramJaccardPairs]] (block column + optional `maxDocFreq` hot-
    * shingle cap, unhinted anti-join); denominators are each side's FULL
    * distinct-shingle count even when the cap trims the index, so a
    * capped run can only UNDER-report containment (recall-for-
    * boundedness, never a false positive).
    */
  def ngramContainmentPairs(docs: DataFrame, idCol: String, textCol: String,
      blockCol: String, threshold: Double, maxDocFreq: Long = 0L,
      fast: Boolean = false): DataFrame = {
    val sh0 = docs.select(col(idCol).as("doc_id"), col(blockCol).as("block"),
      explode(bigramShingles(col(textCol), fast)).as("shingle"))
      .localCheckpoint(true)
    val n = sh0.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val sh =
      if (maxDocFreq > 0) {
        val hot = sh0.groupBy("shingle").agg(count(lit(1)).as("df"))
          .filter(col("df") > maxDocFreq).select("shingle")
        sh0.join(hot, Seq("shingle"), "left_anti")
      } else sh0
    sh.as("a")
      .join(sh.as("b"),
        col("a.shingle") === col("b.shingle") &&
          col("a.block") === col("b.block") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("common"))
      .join(n.select(col("doc_id").as("doc_a"), col("n_sh").as("n_a")), Seq("doc_a"))
      .join(n.select(col("doc_id").as("doc_b"), col("n_sh").as("n_b")), Seq("doc_b"))
      .withColumn("containment_a",
        round(col("common").cast("double") / col("n_a"), 6))
      .withColumn("containment_b",
        round(col("common").cast("double") / col("n_b"), 6))
      .filter(greatest(col("containment_a"), col("containment_b")) >= threshold)
      .select("doc_a", "doc_b", "common", "containment_a", "containment_b")
  }

  /** Bloom-pruned exact-content screen of a small BATCH against a huge
    * REFERENCE digest set — the runtime-row-filter pattern made explicit:
    * the exact screen in [[dedupAgainstIndex]] anti-joins batch digests
    * against O(corpus) reference digests, which shuffles the full
    * reference digest frame on every exchange-less-miss; here a Bloom
    * sketch of the BATCH digests (bounded — fail-loud `maxBatchDigests`)
    * is embedded in the plan as a literal, so the reference scan drops
    * every definitely-not-in-batch digest MAP-SIDE via Spark's native
    * codegen'd `might_contain` before anything shuffles. Only true
    * duplicates plus an fpp-fraction of the reference cross the exchange:
    * at 1 B reference digests and fpp=0.01, ~10 M rows shuffle instead of
    * 1 B. False positives are removed by the exact confirm join (the
    * sketch is built and probed over xxhash64 of the md5 digest, and a
    * Bloom filter has no false negatives), so the result is EXACTLY the
    * plain anti-join's.
    *
    * `refDigests` is a one-column `__fp` frame of distinct reference md5
    * digests — [[ReferenceDedupIndex.digests]] is exactly this frame, so
    * a prebuilt dd46 index plugs in directly. Returns surviving batch
    * rows (all caller columns); null-text rows survive, as everywhere in
    * this family. Building the sketch runs one eager job over the batch
    * digests (the same contract as Spark's own `df.stat.bloomFilter`,
    * which this rides) — batch-proportional, the frame the operator must
    * bound anyway.
    */
  def bloomScreen(refDigests: DataFrame, batch: DataFrame, textCol: String,
      fpp: Double = 0.01, maxBatchDigests: Long = 4L * 1000 * 1000): DataFrame = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    val b = batch.withColumn("__fp", md5(col(textCol)))
    val bDig = b.select("__fp").filter(col("__fp").isNotNull).distinct()
      .localCheckpoint(false)
    val n = bDig.count()
    require(n <= maxBatchDigests,
      s"bloomScreen: batch has $n distinct digests > $maxBatchDigests — " +
        "the sketch (and the confirm join's small side) must stay " +
        "driver/broadcast-sized; screen a bounded batch or raise the limit")
    if (n == 0) return b.drop("__fp") // all-null batch: nothing can match
    graft.functions.GraftFunctions.register(batch.sparkSession)
    val numBits = math.max(64L,
      org.apache.spark.util.sketch.BloomFilter.optimalNumOfBits(n, fpp))
    // distributed sketch build (partial sketches OR-merge map-side); the
    // single binary row materializes here — bounded bytes, the same
    // driver-holds-sketch contract as Spark's df.stat.bloomFilter
    val sketchBytes = bDig
      .agg(graft.functions.GraftFunctions
        .bloomAgg(xxhash64(col("__fp")), n, numBits).as("__sketch"))
      .head().getAs[Array[Byte]]("__sketch")
    val mightContain = graft.functions.GraftFunctions.bloomContains(
      lit(sketchBytes), xxhash64(col("__fp")))
    // map-side prune of the reference scan; only bloom hits reach the join
    val dupFps = refDigests.filter(mightContain)
      .join(bDig, Seq("__fp"), "left_semi")
    b.join(dupFps, Seq("__fp"), "left_anti").drop("__fp")
  }
}

/** Minimal open-addressing long→long hash map for the cluster loop's
  * per-partition label lookups (r16) — the hot path touches every edge
  * every round, and a java.util.HashMap would box two Longs per access.
  * Linear probing, power-of-two capacity, grows at 50% load. Instances
  * are created inside task closures (never serialized).
  */
private[operators] final class LongLongMap(initialCapacity: Int = 1 << 10) {
  private var cap = Integer.highestOneBit(math.max(16, initialCapacity))
  if (cap < initialCapacity) cap <<= 1
  private var keys = new Array[Long](cap)
  private var vals = new Array[Long](cap)
  private var used = new Array[Boolean](cap)
  private var n = 0

  private def slot(k: Long): Int = {
    var h = (k ^ (k >>> 32)).toInt * 0x9E3779B9
    h ^= (h >>> 16)
    var i = h & (cap - 1)
    while (used(i) && keys(i) != k) i = (i + 1) & (cap - 1)
    i
  }

  private def grow(): Unit = {
    val ok = keys; val ov = vals; val ou = used; val oc = cap
    cap <<= 1
    keys = new Array[Long](cap); vals = new Array[Long](cap)
    used = new Array[Boolean](cap)
    var i = 0
    while (i < oc) {
      if (ou(i)) { val s = slot(ok(i)); keys(s) = ok(i); vals(s) = ov(i); used(s) = true }
      i += 1
    }
  }

  private def insert(i: Int, k: Long, v: Long): Unit = {
    keys(i) = k; vals(i) = v; used(i) = true; n += 1
    if (n * 2 > cap) grow()
  }

  def put(k: Long, v: Long): Unit = {
    val i = slot(k)
    if (used(i)) vals(i) = v else insert(i, k, v)
  }

  /** vals(k) = min(vals(k), v), inserting v when absent. */
  def mergeMin(k: Long, v: Long): Unit = {
    val i = slot(k)
    if (used(i)) { if (v < vals(i)) vals(i) = v } else insert(i, k, v)
  }

  def get(k: Long, dflt: Long): Long = {
    val i = slot(k)
    if (used(i)) vals(i) else dflt
  }

  /** Fail-loud lookup for keys the loop's alignment invariant guarantees
    * to exist — a miss means partition misalignment, never valid data. */
  def getOrError(k: Long): Long = {
    val i = slot(k)
    if (!used(i)) throw new IllegalStateException(
      s"dupClusters loop: label for id $k not in its home partition")
    vals(i)
  }

  def iterator: Iterator[(Long, Long)] = new Iterator[(Long, Long)] {
    private var i = 0
    private def advance(): Unit = { while (i < cap && !used(i)) i += 1 }
    advance()
    def hasNext: Boolean = i < cap
    def next(): (Long, Long) = { val r = (keys(i), vals(i)); i += 1; advance(); r }
  }
}
