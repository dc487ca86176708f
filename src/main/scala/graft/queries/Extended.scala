package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Closes the remaining SURVEY.md §2 operator rows not covered by the core
  * sets: A9 (incremental re-aggregation), A11 (`max_by` as the direct
  * arg_max primitive), A17's scale twin (`percentile_approx`), X10
  * (`regexp_extract`).
  */
object Extended extends QuerySet {

  /** A9 (ref: process_test_data.py:112-148 upsert-accumulate) — declared
    * semantics are group-total recompute, expressed as mergeable partial
    * aggregates: two batch-level partials union and re-aggregate (count →
    * sum, sum → sum, max → max). This is the idiom for incrementally
    * maintaining a gold mart without the reference's order-dependent
    * running average.
    */
  def q26(s: SparkSession, dir: String): DataFrame = {
    val o = Q.t(s, dir, "orders")
    def partial(filter: org.apache.spark.sql.Column): DataFrame =
      o.filter(filter).groupBy("o_orderpriority").agg(
        count(lit(1)).as("cnt"),
        Q.dsum(col("o_totalprice")).as("sum_price"),
        max(col("o_orderdate")).as("max_date"))
    partial(col("o_orderkey") % 2 === 0)
      .unionByName(partial(col("o_orderkey") % 2 === 1))
      .groupBy("o_orderpriority")
      .agg(
        sum(col("cnt")).cast("long").as("cnt"),
        sum(col("sum_price")).as("sum_price"),
        max(col("max_date")).as("max_date"))
  }

  /** A11 (ref: monitoring/sftp-monitoring-queries.md:34 `arg_max`) — the
    * direct aggregate form of latest-per-key (q10 is the window form): one
    * shuffle, no row_number state. Max timestamps are unique per user in
    * the fixtures, so the result is deterministic.
    */
  def q27(s: SparkSession, dir: String): DataFrame =
    Q.t(s, dir, "events")
      .groupBy("user_id")
      .agg(
        expr("max_by(event_id, ts)").as("latest_event_id"),
        expr("max_by(event_type, ts)").as("latest_event_type"),
        max(col("ts")).as("latest_ts"))

  /** A17 scale twin (ref: portal-backend-spec.md:208) — percentile_approx
    * sketches merge across partitions without holding the values, the
    * 100 TB replacement for q13's exact percentiles. Raw sketch outputs
    * differ between engines, so the oracle-checkable contract is the sketch
    * guarantee itself — a RANK bound, not a value bound: the sketch returns
    * an actual order statistic whose rank is within n/accuracy of p·n, so
    * it must land between the values at ranks ≈(p-0.02)·n and ≈(p+0.02)·n.
    * Band endpoints are themselves percentile_approx calls at p±0.02 —
    * ATTAINABLE order statistics (never interpolated values that can sit
    * strictly between data points and flake on tie-free small groups), and
    * since every sketch's rank error is ≤ n/10000 ≪ 0.02·n, monotonicity
    * of value-by-rank guarantees lo ≤ sketch ≤ hi deterministically. The
    * booleans hash against DuckDB `TRUE` literals, so a drifting sketch
    * fails the gate. No per-group buffering anywhere — unlike an exact
    * nearest-rank band (sorted collect_list), this verification is itself
    * mergeable sketch state, safe at 100 TB group sizes.
    */
  def q28(s: SparkSession, dir: String): DataFrame = {
    def pa(p: Double) = percentile_approx(col("value"), lit(p), lit(10000))
    Q.t(s, dir, "events")
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("cnt"),
        pa(0.50).as("p50a"), pa(0.95).as("p95a"),
        pa(0.48).as("p50lo"), pa(0.52).as("p50hi"),
        pa(0.93).as("p95lo"), pa(0.97).as("p95hi"))
      .select(col("event_type"), col("cnt"),
        col("p50a").between(col("p50lo"), col("p50hi")).as("p50_in_rank_band"),
        col("p95a").between(col("p95lo"), col("p95hi")).as("p95_in_rank_band"))
  }

  /** X10 (ref: monitoring/sftp-monitoring-queries.md:31-32 KQL `extract`)
    * — typed column extraction from semi-structured text via regex.
    */
  def q29(s: SparkSession, dir: String): DataFrame =
    Q.t(s, dir, "events")
      .withColumn("k", regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("int"))
      .groupBy("k")
      .agg(count(lit(1)).as("cnt"), countDistinct(col("user_id")).as("n_users"))

  /** Skew pattern (SURVEY §7.4.4): two-phase salted aggregation — results
    * identical to the direct groupBy (the oracle computes the plain form),
    * but no single task ever owns a hot key's full row set. sum is cast
    * through decimal (Q.dsum semantics) at the partial stage so the
    * two-level double merge stays deterministic.
    */
  def q30(s: SparkSession, dir: String): DataFrame = {
    val li = Q.t(s, dir, "lineitem")
      .withColumn("qty_dec", col("l_quantity").cast("decimal(18,2)"))
    graft.operators.Skew.saltedAgg(
      li,
      keys = Seq("l_returnflag"),
      saltBy = concat_ws("-", col("l_orderkey"), col("l_linenumber")),
      salts = 16,
      aggs = Seq(("sum", "qty_dec"), ("count", "l_orderkey"),
        ("min", "l_shipdate"), ("max", "l_shipdate")))
      .select(
        col("l_returnflag"),
        col("sum_qty_dec").cast("double").as("sum_qty"),
        col("count_l_orderkey").as("cnt"),
        col("min_l_shipdate").as("min_ship"),
        col("max_l_shipdate").as("max_ship"))
  }

  /** Sessionization (gaps-and-islands, W-family): per-user sessions with a
    * 30-minute inactivity gap — one shuffle on user_id shared by the lag
    * window, running-sum window and final per-session aggregate. Streaming
    * twin: `session_window` (StreamingSpec).
    */
  def q31(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sessions.sessionStats(
      Q.t(s, dir, "events"), "user_id", "ts", "event_id", gapSeconds = 1800L)

  /** Deterministic stratified sampling (training-data mixing): hash-of-id
    * membership per event_type — reproducible across engines/retries, no
    * RNG state, verifiable by the oracle computing the same md5 bucket.
    */
  def q32(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.stratified(
      Q.t(s, dir, "events").select("event_id", "user_id", "event_type", "value"),
      "event_type", "event_id",
      rates = Map("purchase" -> 1.0, "error" -> 0.5, "view" -> 0.1),
      defaultRate = 0.25)

  /** Token-budgeted corpus assembly (training-data mixing): per source,
    * admit documents in deterministic hash order until the source's token
    * budget is exhausted — the exact-budget, reproducible form of corpus
    * mixing (a random shuffle would admit a different set every run).
    */
  def q33(s: SparkSession, dir: String): DataFrame = {
    val docs = Q.t(s, dir, "documents").select(
      col("doc_id"), col("source"),
      size(split(col("text"), " ")).as("n_tokens"))
    graft.operators.Sampling.tokenBudget(docs, "source", "doc_id", "n_tokens",
      budgets = Map("src0" -> 1000L, "src1" -> 200L), defaultBudget = 600L)
  }

  /** Deterministic per-key cap: at most 3 events per user, chosen by the
    * stable hash order (the per-source row cap before interleaving).
    */
  def q34(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.perKeyCap(
      Q.t(s, dir, "events").select("event_id", "user_id", "event_type"),
      "user_id", "event_id", k = 3)

  /** Mixture-weighted interleave: the first 300 rows of a 3.0/1.5/1.0
    * weighted mix over sources — the sampling-proportion knob of a
    * training mix, exact and engine-reproducible (see
    * [[graft.operators.Sampling.weightedMix]]).
    */
  def q35(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.weightedMix(
      Q.t(s, dir, "documents").select("doc_id", "source"),
      "source", "doc_id",
      weights = Map("src0" -> 3.0, "src1" -> 1.5), defaultWeight = 1.0,
      n = 300)

  /** Temperature-scaled source mixing weights (q62, r11): derives the
    * per-source sampling weights q35's interleave consumes — the GPT-3 /
    * LLaMA count^α recipe at the IEEE-exact dials α ∈ {1, 1/2} (see
    * [[graft.operators.Sampling.temperatureWeights]] for why pow() is
    * off the table cross-engine). One census pass; source-sized output.
    */
  def q62(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.temperatureWeights(
      Q.t(s, dir, "documents").select(col("source"),
        size(split(col("text"), " ")).as("n_tokens")),
      "source", "n_tokens")

  /** Deterministic epoch shuffle (q63, r13): every document's shard and
    * within-shard training position under seed 7's permutation, 8 shards
    * (see [[graft.operators.Sampling.epochShuffle]] — the bucketed
    * two-pass rank, never a per-shard single-task sort). The oracle
    * recomputes the same md5 permutation and ranks with a plain
    * partitioned ROW_NUMBER.
    */
  def q63(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.epochShuffle(
      Q.t(s, dir, "documents").select(col("doc_id"), col("source")),
      "doc_id", seed = 7L, nShards = 8)

  /** Token-budget allocation across sources (q64, r13): the LLaMA-style
    * "sampling proportion / epochs" planning table at a 1M-token budget
    * over the α = 1/2 flattened weights (see
    * [[graft.operators.Sampling.epochAllocation]] — integer-exact
    * allocation, one double division per row).
    */
  def q64(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.epochAllocation(
      Q.t(s, dir, "documents").select(col("source"),
        size(split(col("text"), " ")).as("n_tokens")),
      "source", "n_tokens", budgetTokens = 1000000L)

  /** Epoch materialization (q65, r14): q64's allocation realized as
    * per-document integer repeat counts — whole epochs for every
    * document, the fractional remainder as one extra repeat for a
    * deterministic 16-bit-hash subset (see
    * [[graft.operators.Sampling.epochMaterialize]] — all-integer, one
    * broadcast join, no corpus shuffle). The oracle recomputes the
    * identical allocation + hash decision in SQL.
    */
  def q65(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.epochMaterialize(
      Q.t(s, dir, "documents").select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).as("n_tokens")),
      "source", "doc_id", "n_tokens", budgetTokens = 1000000L)

  /** The end-to-end epoch stream (q66, r14): what the trainer actually
    * reads — q65's repeat instances exploded and run through the q63
    * epoch shuffle, so every (document, repeat) occurrence gets its own
    * shard and position under a fresh permutation (two reads of the
    * same document land far apart). Composes the planning (q64),
    * materialization (q65) and layout (q63) operators into the final
    * shard-writer manifest; instance identity is the "doc#rep" string,
    * so the permutation is stable under corpus growth.
    */
  def q66(s: SparkSession, dir: String): DataFrame = {
    val inst = q65(s, dir)
      .filter(col("repeats") >= 1)
      .withColumn("rep", explode(sequence(lit(1L), col("repeats"))))
      .withColumn("iid", concat(col("doc_id").cast("string"), lit("#"),
        col("rep").cast("string")))
      .select(col("doc_id"), col("rep"), col("iid"))
    graft.operators.Sampling.epochShuffle(inst, "iid", seed = 11L,
        nShards = 8)
      .select(col("doc_id"), col("rep"), col("shard"), col("pos"))
  }

  /** Curriculum ordering (q67, r14): the length-curriculum schedule —
    * documents bucketed into 128-token length tiers (capped at 9), then
    * [[graft.operators.Sampling.curriculumShuffle]] lays every shard out
    * tier-major (all shorter docs first) with the seed's md5 permutation
    * inside each tier. Same two-pass bucketed-prefix rank as q63; the
    * oracle pays a plain per-shard (tier, hash) sort.
    */
  def q67(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.curriculumShuffle(
      Q.t(s, dir, "documents").select(col("doc_id"),
        expr("least(size(split(text, ' ')) DIV 128, 9L)").as("tier")),
      "doc_id", "tier", seed = 5L, nShards = 8)

  /** Epoch-stream sequence packing (q68, r15): the last step of the
    * trainer path — q66's shard-writer manifest packed into fixed
    * 512-token training sequences, per shard, in the manifest's own
    * (shard, pos) order (see [[graft.operators.Sampling.packStream]] —
    * the range-block bucketed prefix sum, never a per-shard single-task
    * sort). Each (document, repeat) instance learns its within-shard
    * token offset, the shard-local sequence ids it spans, and the
    * intra-sequence offset its tokens begin at (`seq_off`). Composes
    * allocation (q64) → materialization (q65) → layout (q63 idiom) →
    * packing; the oracle replays q66's CTE with n_tokens carried and a
    * plain partitioned window sum.
    */
  def q68(s: SparkSession, dir: String): DataFrame = {
    val inst = q65(s, dir)
      .filter(col("repeats") >= 1)
      .withColumn("rep", explode(sequence(lit(1L), col("repeats"))))
      .withColumn("iid", concat(col("doc_id").cast("string"), lit("#"),
        col("rep").cast("string")))
      .select(col("doc_id"), col("rep"), col("iid"), col("n_tokens"))
    val manifest = graft.operators.Sampling.epochShuffle(inst, "iid",
        seed = 11L, nShards = 8)
      .select(col("doc_id"), col("rep"), col("n_tokens"), col("shard"),
        col("pos"))
    graft.operators.Sampling.packStream(manifest, "shard", "pos",
        "n_tokens", seqLen = 512L)
      .withColumn("seq_off", expr("start_offset % 512L"))
      .select(col("doc_id"), col("rep"), col("shard"), col("pos"),
        col("n_tokens"), col("start_offset"), col("first_seq"),
        col("last_seq"), col("n_seqs"), col("seq_off"))
  }

  /** Sequence packing (concatenate-and-chunk): where each document's
    * tokens land in the fixed-512-token training-sequence layout (see
    * [[graft.operators.Sampling.packSequences]]).
    */
  def q36(s: SparkSession, dir: String): DataFrame = {
    val docs = Q.t(s, dir, "documents").select(
      col("doc_id"),
      size(split(col("text"), " ")).as("n_tokens"))
    graft.operators.Sampling.packSequences(docs, "doc_id", "n_tokens",
      seqLen = 512L)
  }

  /** Skewed-join pattern (SURVEY §7.4.4, the join-side complement of q30):
    * lineitem⋈orders through [[graft.operators.Skew.saltedJoin]] with 8
    * salts — the orders side replicates ×8, the fact side salts on
    * l_linenumber, and no task ever owns a hot orderkey's full fact rows.
    * The aggregate on top keeps the oracle output bounded; the oracle
    * computes the plain join, so the hash-match IS the proof that salting
    * never changes semantics.
    */
  def q37(s: SparkSession, dir: String): DataFrame = {
    val li = Q.t(s, dir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
    val ord = Q.t(s, dir, "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    graft.operators.Skew.saltedJoin(li, ord, Seq("l_orderkey"),
      saltBy = col("l_linenumber"), salts = 8)
      .groupBy("o_orderpriority", "l_returnflag")
      .agg(
        Q.dsum(col("l_quantity")).as("sum_qty"),
        count(lit(1)).as("cnt"))
  }

  /** Native CUBE grouping sets (q38, the A18 rollup family's direct
    * operator form): per-(source, lang) counts with all subtotal
    * combinations in one pass, `grouping()` flags disambiguating
    * subtotal nulls from data nulls. Scale shape: cube Expands each row
    * ×4 (one per grouping set) but partial aggregation collapses the
    * expansion map-side before the one exchange — unlike q08's
    * multi-distinct Expand (which carried distinct VALUES through the
    * shuffle), the carried state here is one count+sum per group, so the
    * exchange stays group-bounded at any corpus size.
    */
  def q38(s: SparkSession, dir: String): DataFrame =
    Q.t(s, dir, "documents")
      .cube(col("source"), col("lang"))
      .agg(
        grouping(col("source")).cast("int").as("g_source"),
        grouping(col("lang")).cast("int").as("g_lang"),
        count(lit(1)).as("cnt"),
        sum(col("n_chars")).cast("long").as("sum_chars"))

  /** Funnel / conversion analysis (q44): per user, the first `view` and
    * the first `purchase` strictly after it, plus the conversion lag —
    * the ordered-step sequence query an events product analytics surface
    * runs. One shuffle: the per-user first-view window and the final
    * aggregate share the user_id hash partitioning; the purchase step is
    * a conditional aggregate over the SAME pass (no self-join, no second
    * corpus scan). Users with no view (or no qualifying purchase) keep a
    * row with nulls — a funnel report must show drop-off, not omit it.
    */
  def q44(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
    Q.t(s, dir, "events")
      .withColumn("first_view",
        min(when(col("event_type") === "view", col("ts"))).over(w))
      .groupBy("user_id")
      .agg(
        min(when(col("event_type") === "view", col("ts"))).as("first_view"),
        min(when(col("event_type") === "purchase"
          && col("ts") > col("first_view"), col("ts"))).as("first_purchase"))
      .select(col("user_id"), col("first_view"), col("first_purchase"),
        (unix_timestamp(col("first_purchase"))
          - unix_timestamp(col("first_view"))).as("seconds_to_convert"))
  }

  /** Batch twin of the st54 stream-stream join (q45): every (view,
    * purchase) pair of the same user with the purchase inside the hour
    * after the view — the time-range correlation join, oracled so the
    * streaming entry's parity `require` chains to DuckDB. One user-keyed
    * shuffle joins the two filtered sides; the time-range predicate
    * bounds the per-user pair expansion.
    */
  def q45(s: SparkSession, dir: String): DataFrame = {
    val ev = Q.t(s, dir, "events")
    graft.streaming.EventStreaming.viewPurchaseJoin(
      ev.filter(col("event_type") === "view"),
      ev.filter(col("event_type") === "purchase"))
  }

  /** Z-order layout key (q46): Morton-interleave of (user_id % 256,
    * hour-of-day) over the events table — the multi-dimensional
    * clustering key a 100 TB write would range-partition on so parquet
    * min/max stats stay tight in BOTH predicate dimensions (see
    * [[graft.operators.Layout]]). The key is pure shift/mask arithmetic,
    * bit-identical in any engine, hence fully oracled.
    */
  def q46(s: SparkSession, dir: String): DataFrame = {
    val ev = Q.t(s, dir, "events")
    ev.select(col("event_id"),
      graft.operators.Layout.mortonKey(
        (col("user_id") % 256).cast("int"),
        hour(col("ts")).cast("int"), bits = 8).as("zkey"))
  }

  /** PageRank (q47): three fixed-point rounds over a deterministic
    * synthetic link graph (one bijective edge family + one quadratic,
    * skewed family per document — the in-degree skew makes authority
    * genuinely uneven). Ranks travel as exact 2^-40 fixed-point longs so
    * every summation is integer-exact (see
    * [[graft.operators.Graphs.pageRank]]), which is what lets an
    * iterative double-damped computation hash-match DuckDB bit-for-bit.
    */
  def q47(s: SparkSession, dir: String): DataFrame = {
    val docs = Q.t(s, dir, "documents").select(col("doc_id"))
    val n = docs.count()
    val edges = docs.select(col("doc_id").as("src"), explode(array(
      (col("doc_id") * 7 + 1) % n,
      (col("doc_id") * col("doc_id") * 13 + 3) % n)).as("dst"))
    graft.operators.Graphs.pageRank(edges, "src", "dst", iters = 3)
      .withColumnRenamed("node", "doc_id")
  }

  /** As-of join (q48): each purchase picks up the latest view at-or-before
    * it per user — the nearest-prior-event lookup Spark has no operator
    * for, built as [[graft.operators.Temporal.asofJoin]]'s
    * union-and-window (ONE user-keyed shuffle, O(left+right) rows, no
    * join expansion). The right side is deduped to one view per
    * (user, ts) so the as-of pick is well-defined; the oracle is DuckDB's
    * NATIVE `ASOF LEFT JOIN` — the two implementations share no code
    * path at all, which is the point of the check.
    */
  def q48(s: SparkSession, dir: String): DataFrame = {
    val ev = Q.t(s, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val views = ev.filter(col("event_type") === "view")
      .groupBy("user_id", "ts").agg(max(col("event_id")).as("view_id"))
    graft.operators.Temporal.asofJoin(purchases, views,
      keyCol = "user_id", leftTs = "ts", rightTs = "ts",
      rightValCol = "view_id")
  }

  /** Bucketed as-of join with null-valued right rows (q56): q48's
    * view-before-purchase lookup run through [[graft.operators.Temporal
    * .asofJoinBucketed]] (day buckets — the hot-key-bounded form) over a
    * feed where every 7th view row carries a NULL view_id (deterministic
    * injection, the td34 pattern — identical CASE in both engines). The
    * oracle is DuckDB's NATIVE `ASOF LEFT JOIN` over the same nulled
    * feed, so the hash pins BOTH contracts at once: the bucketed
    * carry-in loses nothing vs the key-window form, and a null-VALUED
    * as-of row is returned as (null, its own ts) — row semantics, never
    * an older row's value (the r8 struct-carry fix).
    */
  def q56(s: SparkSession, dir: String): DataFrame = {
    val ev = Q.t(s, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val views = ev.filter(col("event_type") === "view")
      .groupBy("user_id", "ts")
      .agg(when(max(col("event_id")) % 7 =!= 0, max(col("event_id")))
        .as("view_id"))
    graft.operators.Temporal.asofJoinBucketed(purchases, views,
      keyCol = "user_id", leftTs = "ts", rightTs = "ts",
      rightValCol = "view_id", bucketSeconds = 86400L)
  }

  /** Interval-overlap join (q49): which user sessions (from the oracled
    * q31 sessionizer, over a 1-in-50 user subset) overlap in wall-clock
    * time — the interval join the prompt-level operator inventory names,
    * in its BUCKETED form ([[graft.operators.Temporal
    * .intervalOverlapPairs]]): intervals explode into hour buckets,
    * candidates join per bucket, the exact predicate + distinct finish —
    * LSH-banding economics applied to time, never an all-pairs product.
    * The oracle runs the naive quadratic overlap join; hash-equality IS
    * the proof the bucketed plan loses nothing.
    */
  def q49(s: SparkSession, dir: String): DataFrame = {
    val sess = graft.operators.Sessions.sessionStats(
      Q.t(s, dir, "events").filter(col("user_id") % 50 === 0),
      "user_id", "ts", "event_id", gapSeconds = 1800L)
    val iv = sess.select(
      (col("user_id") * 100000 + col("session_seq")).as("iv_id"),
      col("session_start"), col("session_end"))
    graft.operators.Temporal.intervalOverlapPairs(iv, "iv_id",
      "session_start", "session_end", bucketSeconds = 3600L)
  }

  /** HLL sketch re-aggregation (q50): per-source distinct-token sketches
    * (Spark's native Datasketches `hll_sketch_agg`) MERGED into a global
    * count via `hll_union_agg` — the A4/A9 pattern with sketch state: a
    * 100 TB pipeline keeps per-partition/per-day sketches and answers
    * corpus-wide distinct questions by unioning kilobytes, never
    * re-scanning. Sketches are deterministic for fixed input, so the
    * ±5 % accuracy bands hash-oracle as q28-style TRUE booleans against
    * the exact distinct counts (which DuckDB recomputes exactly).
    */
  def q50(s: SparkSession, dir: String): DataFrame = {
    val tok = Q.t(s, dir, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
    val per = tok.groupBy("source").agg(
      expr("hll_sketch_agg(token)").as("sk"),
      countDistinct(col("token")).as("exact_distinct"))
    val perSrc = per.select(col("source"), col("exact_distinct"),
      expr("hll_sketch_estimate(sk)").as("est"))
    val global = per.agg(expr("hll_union_agg(sk)").as("sk"))
      .crossJoin(tok.agg(countDistinct(col("token")).as("exact_distinct")))
      .select(lit("__all").as("source"), col("exact_distinct"),
        expr("hll_sketch_estimate(sk)").as("est"))
    perSrc.unionByName(global)
      .select(col("source"), col("exact_distinct"),
        (abs(col("est") - col("exact_distinct"))
          <= col("exact_distinct") * lit(0.05)).as("est_within_5pct"))
  }

  /** Token co-occurrence mining (q51, the market-basket/frequent-pair
    * family): the 20 most frequent within-document distinct-token pairs —
    * DEDUP-BEFORE-EXPAND over the doc_id-keyed SELF-JOIN shape. Identical
    * texts have identical distinct-token sets, so the quadratic pair
    * expansion runs once per UNIQUE text and each pair's document count
    * is the Σ of text multiplicities (r9; the exact-dup rate is precisely
    * what a crawl corpus carries, and the heavy tier's 10×-dup draw
    * dropped 0.79 → ~0.3 s for it — pair volume is the whole cost). The
    * census is one linear text-keyed exchange (partial-aggregated, so
    * co-located replicas collapse map-side); then the r8 streaming shape
    * on the deduped frame: explode each unique text's distinct tokens,
    * shuffle-hash self-join on the representative doc_id with
    * `tok_a < tok_b`, pair-keyed `Σ weight` aggregate,
    * TakeOrderedAndProject cut. Pairs STREAM from the codegen'd join
    * straight into the partial aggregate — no C(k,2) array is ever
    * materialized per document, memory stays bounded for any document
    * length, and both join sides read ONE ReusedExchange (the weight is
    * summed as `(w_l + w_r) div 2` — equal on every matched row — purely
    * to keep the two projections identical so the exchange reuses; a
    * one-sided `sum(w)` would let column pruning fork the plans). The r7
    * nested-HOF form interpreted three lambdas per doc: 41× the oracle;
    * the r8-interim native local expansion (`graft_pairs`, removed) was
    * allocation-bound on 150M pair strings.
    */
  def q51(s: SparkSession, dir: String): DataFrame = {
    val rep = Q.t(s, dir, "documents")
      .groupBy(col("text"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("w"))
    val toks = rep.select(col("doc_id"), col("w"),
        explode(array_distinct(split(col("text"), " "))).as("tok"))
      .filter(length(col("tok")) > 0)
    toks.as("l").hint("shuffle_hash")
      .join(toks.as("r").hint("shuffle_hash"),
        col("l.doc_id") === col("r.doc_id"))
      .filter(col("l.tok") < col("r.tok"))
      .groupBy(col("l.tok").as("tok_a"), col("r.tok").as("tok_b"))
      .agg(expr("sum(l.w + r.w) div 2").as("n_docs"))
      .orderBy(col("n_docs").desc, col("tok_a").asc, col("tok_b").asc)
      .limit(20)
  }

  /** Cohort retention (q52): users cohorted by first-activity day, then
    * the (cohort_day, days_since_cohort) matrix of distinct active users
    * — the product-analytics retention curve. Two shuffles: the per-user
    * first-day aggregate (reused via its own user-keyed exchange by the
    * join back onto events) and the final matrix aggregate; the date
    * arithmetic is integer day-diffs, exact in both engines.
    */
  def q52(s: SparkSession, dir: String): DataFrame = {
    val ev = Q.t(s, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("day"))
    val cohorts = ev.groupBy("user_id").agg(min(col("day")).as("cohort_day"))
    ev.join(cohorts, Seq("user_id"))
      .groupBy(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).as("days_since"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  /** Sliding time windows (q53): 1-hour windows every 15 minutes per
    * event type — the OVERLAPPING flavor of the W2 tumbling rollups
    * (each event lands in 4 windows; trend dashboards smooth exactly
    * this way). Spark's `window(ts, "1 hour", "15 minutes")` expands the
    * 4 memberships map-side before one (window, type) aggregate; the
    * oracle regenerates the same epoch-aligned window starts per event.
    * Window start travels as epoch seconds (exact integer in both
    * engines).
    */
  def q53(s: SparkSession, dir: String): DataFrame =
    Q.t(s, dir, "events")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), Q.dsum(col("value")).as("sum_value"))
      .select(unix_timestamp(col("window.start")).as("ws"),
        col("event_type"), col("cnt"), col("sum_value"))

  /** SCD2-style temporal versioning (q54): each user's event stream read
    * as a change log — one VERSION row per state change with
    * [valid_from, valid_to) bounds and a current flag, the
    * slowly-changing-dimension type-2 shape a warehouse maintains for
    * point-in-time joins. Consecutive same-state events collapse first
    * (lag), then `lead` closes each version — both windows and the
    * collapse share ONE user-keyed exchange. Deterministic: (ts,
    * event_id) orders ties.
    */
  def q54(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
    Q.t(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("ts"),
        col("event_type").as("state"))
      .withColumn("__prev", lag(col("state"), 1).over(w))
      .filter(col("__prev").isNull || col("__prev") =!= col("state"))
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .select(col("user_id"), col("state"), col("ts").as("valid_from"),
        col("valid_to"), col("valid_to").isNull.as("is_current"))
  }

  /** Data-quality column profile (q55): per column — row count, null
    * count, EXACT distinct count, min/max (stringified) — the
    * expectation-check report a pipeline gates ingestion on. Plan shape:
    * per column, a value census (groupBy value → count) feeds ONE final
    * aggregate computing every metric from the census — n_rows = Σcnt,
    * n_null = the null group's cnt, n_distinct = non-null census rows,
    * min/max over census keys. No multi-`countDistinct` aggregate
    * anywhere, so no Expand amplification (the q08 lesson): each
    * column's exchange carries its distinct VALUES once — the
    * irreducible cost of an exact distinct — partial-aggregated
    * map-side. Doubles stringify through DECIMAL(18,2): shortest-double
    * printing is not a cross-engine contract, decimal formatting is.
    */
  def q55(s: SparkSession, dir: String): DataFrame = {
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority")
    val o = Q.t(s, dir, "orders")
      .withColumn("o_totalprice", col("o_totalprice").cast("decimal(18,2)"))
    cols.map { c =>
      o.groupBy(col(c).as("__v")).agg(count(lit(1)).as("__cnt"))
        .agg(
          sum(col("__cnt")).cast("long").as("n_rows"),
          coalesce(sum(when(col("__v").isNull, col("__cnt"))), lit(0L))
            .cast("long").as("n_null"),
          count(col("__v")).as("n_distinct"),
          min(col("__v")).cast("string").as("min_str"),
          max(col("__v")).cast("string").as("max_str"))
        .select(lit(c).as("column"), col("n_rows"), col("n_null"),
          col("n_distinct"), col("min_str"), col("max_str"))
    }.reduce(_ unionByName _)
  }

  /** Rolling anomaly screen (q58): per user, each event's cent-quantized
    * value against the mean/variance of its PREVIOUS 8 events — the
    * streaming-shaped outlier gate of a metrics pipeline. The flag
    * evaluates the z-score condition |v−μ| > 3σ in cleared integer form
    * (8·dev² > 9·(8·Σc² − (Σc)²), dev = 8c − Σc), so every row is
    * integer-exact in any engine — no float summation, no rounding. One
    * user-keyed exchange; the sliding sums ride one window.
    */
  def q58(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(-8, -1)
    Q.t(s, dir, "events")
      .withColumn("c", round(col("value") * 100).cast("long"))
      .withColumn("s1", sum(col("c")).over(w))
      .withColumn("s2", sum(col("c") * col("c")).over(w))
      .withColumn("k", count(lit(1)).over(w))
      .filter(col("k") === 8)
      .withColumn("dev", col("c") * 8 - col("s1"))
      .withColumn("is_anomaly",
        col("dev") * col("dev") * 8 >
          lit(9L) * (col("s2") * 8 - col("s1") * col("s1")))
      .select("event_id", "user_id", "c", "dev", "is_anomaly")
  }

  /** Per-node triangle counts (q59): the q47 synthetic link graph through
    * [[graft.operators.Graphs.triangleCounts]] — degree-oriented wedge
    * enumeration (compact-forward), so candidate wedges are charged to
    * each edge's LOW-degree end and a hub never enumerates deg² pairs.
    * The oracle counts the same triangles with the naive a<b<c
    * three-way join — different algorithm, identical exact counts.
    */
  def q59(s: SparkSession, dir: String): DataFrame = {
    val docs = Q.t(s, dir, "documents").select(col("doc_id"))
    val n = docs.count()
    val edges = docs.select(col("doc_id").as("src"), explode(array(
      (col("doc_id") * 7 + 1) % n,
      (col("doc_id") * col("doc_id") * 13 + 3) % n)).as("dst"))
    graft.operators.Graphs.triangleCounts(edges, "src", "dst")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q26_incremental_reagg" -> (q26 _),
    "q27_arg_max" -> (q27 _),
    "q28_percentile_approx" -> (q28 _),
    "q29_regexp_extract" -> (q29 _),
    "q30_salted_agg" -> (q30 _),
    "q31_sessionize" -> (q31 _),
    "q32_stratified_sample" -> (q32 _),
    "q33_token_budget" -> (q33 _),
    "q34_per_key_cap" -> (q34 _),
    "q35_weighted_mix" -> (q35 _),
    "q62_temperature_weights" -> (q62 _),
    "q36_pack_sequences" -> (q36 _),
    "q63_epoch_shuffle" -> (q63 _),
    "q64_epoch_allocation" -> (q64 _),
    "q65_epoch_materialize" -> (q65 _),
    "q66_epoch_stream" -> (q66 _),
    "q67_curriculum_order" -> (q67 _),
    "q68_epoch_pack" -> (q68 _),
    "q37_salted_join" -> (q37 _),
    "q38_cube_rollup" -> (q38 _),
    "q44_funnel_steps" -> (q44 _),
    "q45_view_purchase_join" -> (q45 _),
    "q46_zorder_key" -> (q46 _),
    "q47_pagerank" -> (q47 _),
    "q48_asof_join" -> (q48 _),
    "q49_interval_join" -> (q49 _),
    "q50_hll_reagg" -> (q50 _),
    "q51_cooccurrence" -> (q51 _),
    "q52_cohort_retention" -> (q52 _),
    "q53_sliding_windows" -> (q53 _),
    "q54_scd2_versions" -> (q54 _),
    "q55_column_profile" -> (q55 _),
    "q56_asof_bucketed_nulls" -> (q56 _),
    "q58_rolling_anomaly" -> (q58 _),
    "q59_triangle_counts" -> (q59 _))

  val oracles: Map[String, String] = Map(
    "q58_rolling_anomaly" ->
      """WITH b AS (SELECT event_id, user_id,
        |  CAST(round(value * 100) AS BIGINT) AS c,
        |  CAST(SUM(CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT) AS s1,
        |  CAST(SUM(CAST(round(value * 100) AS BIGINT)
        |    * CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT) AS s2,
        |  count(*) OVER w AS k
        | FROM events
        | WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS BETWEEN 8 PRECEDING AND 1 PRECEDING))
        |SELECT event_id, user_id, c, c * 8 - s1 AS dev,
        |  (c*8 - s1) * (c*8 - s1) * 8 > 9 * (s2*8 - s1*s1) AS is_anomaly
        |FROM b WHERE k = 8""".stripMargin,
    "q59_triangle_counts" ->
      """WITH nn AS (SELECT count(*) AS n FROM documents),
        |e0 AS (SELECT doc_id AS s, (doc_id*7+1) % (SELECT n FROM nn) AS t FROM documents
        |       UNION ALL SELECT doc_id, (doc_id*doc_id*13+3) % (SELECT n FROM nn) FROM documents),
        |und AS (SELECT DISTINCT least(s, t) AS a, greatest(s, t) AS b
        |        FROM e0 WHERE s <> t),
        |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |        FROM und e1 JOIN und e2 ON e1.b = e2.a
        |        JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b)
        |SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
        |FROM (SELECT unnest([x, y, z]) AS node FROM tri) GROUP BY 1""".stripMargin,
    "q26_incremental_reagg" ->
      """WITH p AS (
        | SELECT o_orderpriority, count(*) AS cnt,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  max(o_orderdate) AS max_date
        | FROM orders WHERE o_orderkey % 2 = 0 GROUP BY 1
        | UNION ALL
        | SELECT o_orderpriority, count(*),
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE),
        |  max(o_orderdate)
        | FROM orders WHERE o_orderkey % 2 = 1 GROUP BY 1)
        |SELECT o_orderpriority, CAST(SUM(cnt) AS BIGINT) AS cnt,
        | SUM(sum_price) AS sum_price, max(max_date) AS max_date
        |FROM p GROUP BY 1""".stripMargin,
    "q27_arg_max" ->
      """SELECT user_id, arg_max(event_id, ts) AS latest_event_id,
        | arg_max(event_type, ts) AS latest_event_type, max(ts) AS latest_ts
        |FROM events GROUP BY user_id""".stripMargin,
    "q28_percentile_approx" ->
      """SELECT event_type, count(*) AS cnt,
        | TRUE AS p50_in_rank_band, TRUE AS p95_in_rank_band
        |FROM events GROUP BY event_type""".stripMargin,
    "q29_regexp_extract" ->
      """SELECT CAST(regexp_extract(props, '"k": (\d+)', 1) AS INTEGER) AS k,
        | count(*) AS cnt, count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1""".stripMargin,
    "q30_salted_agg" ->
      """SELECT l_returnflag,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | count(l_orderkey) AS cnt,
        | min(l_shipdate) AS min_ship, max(l_shipdate) AS max_ship
        |FROM lineitem GROUP BY 1""".stripMargin,
    "q31_sessionize" ->
      """WITH o AS (SELECT user_id, event_id, ts,
        |  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        | FROM events),
        |m AS (SELECT *, CASE WHEN prev_ts IS NULL
        |  OR date_diff('second', prev_ts, ts) > 1800 THEN 1 ELSE 0 END AS new_s FROM o),
        |s AS (SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS UNBOUNDED PRECEDING) AS session_seq FROM m)
        |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
        | count(*) AS n_events,
        | min(ts) AS session_start, max(ts) AS session_end,
        | date_diff('second', min(ts), max(ts)) AS duration_seconds
        |FROM s GROUP BY user_id, session_seq""".stripMargin,
    "q32_stratified_sample" ->
      """SELECT event_id, user_id, event_type, value FROM events
        |WHERE CAST('0x' || substr(md5(event_type || '|' || CAST(event_id AS VARCHAR)), 1, 4) AS INTEGER)
        |  < CASE event_type WHEN 'purchase' THEN 65536 WHEN 'error' THEN 32768
        |    WHEN 'view' THEN 6553 ELSE 16384 END""".stripMargin,
    "q33_token_budget" ->
      """WITH d AS (SELECT doc_id, source,
        |  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens FROM documents),
        |c AS (SELECT *, SUM(CAST(n_tokens AS BIGINT)) OVER (PARTITION BY source
        |  ORDER BY md5(source || '|' || CAST(doc_id AS VARCHAR)), doc_id
        |  ROWS UNBOUNDED PRECEDING) AS cum FROM d)
        |SELECT doc_id, source, n_tokens FROM c
        |WHERE cum <= CASE source WHEN 'src0' THEN 1000 WHEN 'src1' THEN 200
        |  ELSE 600 END""".stripMargin,
    "q34_per_key_cap" ->
      """SELECT event_id, user_id, event_type FROM (
        | SELECT event_id, user_id, event_type,
        |  row_number() OVER (PARTITION BY user_id
        |   ORDER BY md5(user_id || '|' || CAST(event_id AS VARCHAR)), event_id) AS rn
        | FROM events) WHERE rn <= 3""".stripMargin,
    // q62: every float is either a correctly-rounded sqrt of an exact
    // long or a single division of two such values, in the SAME
    // expression tree as the Spark side — bit-identical on any engine
    "q62_temperature_weights" ->
      """WITH per AS (SELECT source,
        |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tok
        | FROM documents GROUP BY source),
        |mx AS (SELECT MAX(n_tok) AS m FROM per),
        |w AS (SELECT p.source, p.n_tok,
        |  sqrt(CAST(p.n_tok AS DOUBLE)) AS w_half,
        |  CAST(p.n_tok AS DOUBLE) / CAST(m AS DOUBLE) AS r_flat,
        |  sqrt(CAST(p.n_tok AS DOUBLE)) / sqrt(CAST(m AS DOUBLE)) AS r_half
        | FROM per p CROSS JOIN mx)
        |SELECT source, n_tok, w_half, r_flat, r_half,
        |  r_half / r_flat AS boost_half
        |FROM w""".stripMargin,
    "q35_weighted_mix" ->
      """WITH r AS (SELECT doc_id, source,
        |  md5(source || '|' || CAST(doc_id AS VARCHAR)) AS h,
        |  row_number() OVER (PARTITION BY source
        |   ORDER BY md5(source || '|' || CAST(doc_id AS VARCHAR)), doc_id) AS rnk
        | FROM documents)
        |SELECT doc_id, source FROM r
        |ORDER BY rnk / CASE source WHEN 'src0' THEN 3.0 WHEN 'src1' THEN 1.5
        |  ELSE 1.0 END ASC, h ASC NULLS FIRST, doc_id ASC
        |LIMIT 300""".stripMargin,
    // q63: the identical md5 permutation, shard = the hash's own 16-bit
    // bucket mod 8, rank via a plain partitioned ROW_NUMBER (the oracle
    // can afford the per-shard sort; the Spark side must not)
    "q63_epoch_shuffle" ->
      """WITH h AS (SELECT doc_id, source,
        |  md5('epoch7|' || CAST(doc_id AS VARCHAR)) AS hk FROM documents),
        |s AS (SELECT doc_id, source, hk,
        |  CAST('0x' || substr(hk, 1, 4) AS INTEGER) % 8 AS shard FROM h)
        |SELECT doc_id, source, CAST(shard AS BIGINT) AS shard,
        | CAST(row_number() OVER (PARTITION BY shard ORDER BY hk, doc_id)
        |   AS BIGINT) AS pos
        |FROM s""".stripMargin,
    // q64: quantized-sqrt weights summed as exact longs, integer
    // allocation, one double division per row — bit-identical on any
    // engine (the q62 discipline)
    "q64_epoch_allocation" ->
      """WITH per AS (SELECT source,
        |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tok
        | FROM documents GROUP BY source HAVING n_tok > 0),
        |w AS (SELECT source, n_tok,
        |  CAST(floor(sqrt(CAST(n_tok AS DOUBLE)) * 1048576.0) AS BIGINT)
        |   AS wq FROM per),
        |t AS (SELECT *, (SELECT SUM(wq) FROM w) AS wsum FROM w),
        |a AS (SELECT source, n_tok, wq,
        |  (1000000 * wq) // wsum AS target_tokens FROM t)
        |SELECT source, n_tok, wq, CAST(target_tokens AS BIGINT)
        |  AS target_tokens,
        | CAST(target_tokens AS DOUBLE) / CAST(n_tok AS DOUBLE) AS epochs,
        | CAST(target_tokens AS DOUBLE) / CAST(n_tok AS DOUBLE) > 1.0
        |  AS upsampled
        |FROM a""".stripMargin,
    // q65: the q64 allocation CTE verbatim, reduced to whole/remainder,
    // then the identical 16-bit md5 extra-repeat decision per document
    "q65_epoch_materialize" ->
      """WITH per AS (SELECT source,
        |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tok
        | FROM documents GROUP BY source HAVING n_tok > 0),
        |w AS (SELECT source, n_tok,
        |  CAST(floor(sqrt(CAST(n_tok AS DOUBLE)) * 1048576.0) AS BIGINT)
        |   AS wq FROM per),
        |t AS (SELECT *, (SELECT SUM(wq) FROM w) AS wsum FROM w),
        |a AS (SELECT source, n_tok,
        |  CAST((1000000 * wq) // wsum AS BIGINT) AS target_tokens FROM t),
        |r AS (SELECT source, n_tok, target_tokens // n_tok AS whole,
        |  target_tokens % n_tok AS rem FROM a),
        |d AS (SELECT doc_id, source,
        |  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens
        | FROM documents)
        |SELECT d.doc_id, d.source, d.n_tokens,
        | CAST(r.whole + CASE WHEN
        |   CAST('0x' || substr(md5('mat7|' || CAST(d.doc_id AS VARCHAR)),
        |     1, 4) AS BIGINT) * r.n_tok < r.rem * 65536
        |  THEN 1 ELSE 0 END AS BIGINT) AS repeats
        |FROM d JOIN r USING (source)""".stripMargin,
    // q66: q65's repeats exploded via generate_series, then the q63
    // shard/rank idiom over the instance key 'doc#rep'
    "q66_epoch_stream" ->
      """WITH per AS (SELECT source,
        |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tok
        | FROM documents GROUP BY source HAVING n_tok > 0),
        |w AS (SELECT source, n_tok,
        |  CAST(floor(sqrt(CAST(n_tok AS DOUBLE)) * 1048576.0) AS BIGINT)
        |   AS wq FROM per),
        |t AS (SELECT *, (SELECT SUM(wq) FROM w) AS wsum FROM w),
        |a AS (SELECT source, n_tok,
        |  CAST((1000000 * wq) // wsum AS BIGINT) AS target_tokens FROM t),
        |r AS (SELECT source, n_tok, target_tokens // n_tok AS whole,
        |  target_tokens % n_tok AS rem FROM a),
        |mat AS (SELECT d.doc_id,
        |  r.whole + CASE WHEN
        |    CAST('0x' || substr(md5('mat7|' || CAST(d.doc_id AS VARCHAR)),
        |      1, 4) AS BIGINT) * r.n_tok < r.rem * 65536
        |   THEN 1 ELSE 0 END AS repeats
        | FROM documents d JOIN r USING (source)),
        |inst AS (SELECT doc_id,
        |  unnest(generate_series(1, repeats)) AS rep
        | FROM mat WHERE repeats >= 1),
        |h AS (SELECT doc_id, CAST(rep AS BIGINT) AS rep,
        |  md5('epoch11|' || CAST(doc_id AS VARCHAR) || '#' ||
        |    CAST(rep AS VARCHAR)) AS hk,
        |  CAST(doc_id AS VARCHAR) || '#' || CAST(rep AS VARCHAR) AS iid
        | FROM inst)
        |SELECT doc_id, rep,
        | CAST(CAST('0x' || substr(hk, 1, 4) AS INTEGER) % 8 AS BIGINT)
        |  AS shard,
        | CAST(row_number() OVER (
        |   PARTITION BY CAST('0x' || substr(hk, 1, 4) AS INTEGER) % 8
        |   ORDER BY hk, iid) AS BIGINT) AS pos
        |FROM h""".stripMargin,
    // q68: q66's CTE with per-doc n_tokens carried through the instance
    // explode, then a plain per-shard windowed prefix sum in pos order +
    // the q36 packing arithmetic (the oracle can afford the per-shard
    // sort; the Spark side rides the range-block bucketed prefix)
    "q68_epoch_pack" ->
      """WITH per AS (SELECT source,
        |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tok
        | FROM documents GROUP BY source HAVING n_tok > 0),
        |w AS (SELECT source, n_tok,
        |  CAST(floor(sqrt(CAST(n_tok AS DOUBLE)) * 1048576.0) AS BIGINT)
        |   AS wq FROM per),
        |t AS (SELECT *, (SELECT SUM(wq) FROM w) AS wsum FROM w),
        |a AS (SELECT source, n_tok,
        |  CAST((1000000 * wq) // wsum AS BIGINT) AS target_tokens FROM t),
        |r AS (SELECT source, n_tok, target_tokens // n_tok AS whole,
        |  target_tokens % n_tok AS rem FROM a),
        |mat AS (SELECT d.doc_id,
        |  CAST(len(string_split(d.text, ' ')) AS INTEGER) AS n_tokens,
        |  r.whole + CASE WHEN
        |    CAST('0x' || substr(md5('mat7|' || CAST(d.doc_id AS VARCHAR)),
        |      1, 4) AS BIGINT) * r.n_tok < r.rem * 65536
        |   THEN 1 ELSE 0 END AS repeats
        | FROM documents d JOIN r USING (source)),
        |inst AS (SELECT doc_id, n_tokens,
        |  unnest(generate_series(1, repeats)) AS rep
        | FROM mat WHERE repeats >= 1),
        |h AS (SELECT doc_id, n_tokens, CAST(rep AS BIGINT) AS rep,
        |  md5('epoch11|' || CAST(doc_id AS VARCHAR) || '#' ||
        |    CAST(rep AS VARCHAR)) AS hk,
        |  CAST(doc_id AS VARCHAR) || '#' || CAST(rep AS VARCHAR) AS iid
        | FROM inst),
        |m AS (SELECT doc_id, rep, n_tokens,
        |  CAST(CAST('0x' || substr(hk, 1, 4) AS INTEGER) % 8 AS BIGINT)
        |   AS shard,
        |  CAST(row_number() OVER (
        |    PARTITION BY CAST('0x' || substr(hk, 1, 4) AS INTEGER) % 8
        |    ORDER BY hk, iid) AS BIGINT) AS pos
        | FROM h),
        |c AS (SELECT doc_id, rep, shard, pos, n_tokens,
        |  CAST(coalesce(SUM(CAST(n_tokens AS BIGINT)) OVER (
        |    PARTITION BY shard ORDER BY pos
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |   AS start_offset
        | FROM m)
        |SELECT doc_id, rep, shard, pos, n_tokens, start_offset,
        | CAST(floor(start_offset / 512.0) AS BIGINT) AS first_seq,
        | CAST(floor((start_offset + greatest(CAST(n_tokens AS BIGINT), 1) - 1)
        |   / 512.0) AS BIGINT) AS last_seq,
        | CAST(floor((start_offset + greatest(CAST(n_tokens AS BIGINT), 1) - 1)
        |   / 512.0) AS BIGINT)
        |  - CAST(floor(start_offset / 512.0) AS BIGINT) + 1 AS n_seqs,
        | start_offset % 512 AS seq_off
        |FROM c""".stripMargin,
    // q67: the q63 shard idiom under a TIER-MAJOR within-shard order —
    // the oracle ranks with a plain partitioned (tier, hash) sort
    "q67_curriculum_order" ->
      """WITH d AS (SELECT doc_id,
        |  least(len(string_split(text, ' ')) // 128, 9) AS tier
        | FROM documents),
        |h AS (SELECT doc_id, tier,
        |  md5('curr5|' || CAST(doc_id AS VARCHAR)) AS hk FROM d),
        |s AS (SELECT doc_id, tier, hk,
        |  CAST('0x' || substr(hk, 1, 4) AS INTEGER) % 8 AS shard FROM h)
        |SELECT doc_id, CAST(tier AS BIGINT) AS tier,
        | CAST(shard AS BIGINT) AS shard,
        | CAST(row_number() OVER (PARTITION BY shard
        |   ORDER BY tier, hk, doc_id) AS BIGINT) AS pos
        |FROM s""".stripMargin,
    "q36_pack_sequences" ->
      """WITH d AS (SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens
        | FROM documents),
        |c AS (SELECT doc_id, n_tokens,
        |  CAST(coalesce(SUM(CAST(n_tokens AS BIGINT)) OVER (
        |   ORDER BY md5('pack|' || CAST(doc_id AS VARCHAR)), doc_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |   AS start_offset
        | FROM d)
        |SELECT doc_id, n_tokens, start_offset,
        | CAST(floor(start_offset / 512.0) AS BIGINT) AS first_seq,
        | CAST(floor((start_offset + greatest(CAST(n_tokens AS BIGINT), 1) - 1)
        |   / 512.0) AS BIGINT) AS last_seq,
        | CAST(floor((start_offset + greatest(CAST(n_tokens AS BIGINT), 1) - 1)
        |   / 512.0) AS BIGINT)
        |  - CAST(floor(start_offset / 512.0) AS BIGINT) + 1 AS n_seqs
        |FROM c""".stripMargin,
    "q37_salted_join" ->
      """SELECT o_orderpriority, l_returnflag,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | count(*) AS cnt
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1, 2""".stripMargin,
    "q38_cube_rollup" ->
      """SELECT source, lang,
        | CAST(GROUPING(source) AS INTEGER) AS g_source,
        | CAST(GROUPING(lang) AS INTEGER) AS g_lang,
        | count(*) AS cnt,
        | CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY CUBE (source, lang)""".stripMargin,
    "q44_funnel_steps" ->
      """WITH v AS (SELECT user_id,
        |  min(CASE WHEN event_type = 'view' THEN ts END) AS first_view
        | FROM events GROUP BY 1),
        |p AS (SELECT e.user_id, min(e.ts) AS first_purchase
        | FROM events e JOIN v ON e.user_id = v.user_id
        | WHERE e.event_type = 'purchase' AND e.ts > v.first_view
        | GROUP BY 1)
        |SELECT v.user_id, v.first_view, p.first_purchase,
        | CAST(date_diff('second', v.first_view, p.first_purchase) AS BIGINT)
        |  AS seconds_to_convert
        |FROM v LEFT JOIN p ON v.user_id = p.user_id""".stripMargin,
    "q45_view_purchase_join" ->
      """SELECT v.user_id, v.event_id AS view_id, v.ts AS view_ts,
        | p.event_id AS purchase_id, p.ts AS purchase_ts
        |FROM events v JOIN events p
        | ON v.user_id = p.user_id
        | AND v.event_type = 'view' AND p.event_type = 'purchase'
        | AND p.ts > v.ts
        | AND p.ts <= v.ts + INTERVAL 3600 SECONDS""".stripMargin,
    "q46_zorder_key" -> {
      val terms = (0 until 8).map { i =>
        s"(((user_id % 256) >> $i) & 1) * ${1L << (2 * i)}" +
          s" + ((hour(ts) >> $i) & 1) * ${1L << (2 * i + 1)}"
      }.mkString(" + ")
      s"""SELECT event_id, CAST($terms AS BIGINT) AS zkey FROM events"""
    },
    "q47_pagerank" -> {
      def round(i: Int): String =
        s"""c$i AS (SELECT e.dst,
           |  CAST(SUM(CAST(floor((0.85 * r.rank_q) / od.outdeg) AS BIGINT)) AS BIGINT) AS inq
           | FROM e JOIN r${i - 1} r ON e.src = r.node JOIN od ON e.src = od.src GROUP BY 1),
           |r$i AS (SELECT nd.node,
           |  CAST(CAST(floor(((1.0 - 0.85) * 1099511627776.0) / (SELECT n FROM nn)) AS BIGINT)
           |   + COALESCE(c.inq, 0) AS BIGINT) AS rank_q
           | FROM nodes nd LEFT JOIN c$i c ON nd.node = c.dst)""".stripMargin
      s"""WITH nn AS (SELECT count(*) AS n FROM documents),
         |e AS (SELECT doc_id AS src, (doc_id*7+1) % (SELECT n FROM nn) AS dst FROM documents
         |      UNION ALL SELECT doc_id, (doc_id*doc_id*13+3) % (SELECT n FROM nn) FROM documents),
         |nodes AS (SELECT DISTINCT node FROM
         |  (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
         |od AS (SELECT src, count(*) AS outdeg FROM e GROUP BY 1),
         |r0 AS (SELECT node,
         |  CAST(floor(1099511627776.0 / (SELECT n FROM nn)) AS BIGINT) AS rank_q
         | FROM nodes),
         |${round(1)},
         |${round(2)},
         |${round(3)}
         |SELECT node AS doc_id, rank_q FROM r3""".stripMargin
    },
    "q48_asof_join" ->
      """WITH v AS (SELECT user_id, ts, max(event_id) AS view_id
        | FROM events WHERE event_type = 'view' GROUP BY 1, 2),
        |p AS (SELECT event_id, user_id, ts FROM events
        | WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id, p.ts, v.view_id, v.ts AS right_ts
        |FROM p ASOF LEFT JOIN v
        | ON p.user_id = v.user_id AND p.ts >= v.ts""".stripMargin,
    "q56_asof_bucketed_nulls" ->
      """WITH v AS (SELECT user_id, ts,
        |  CASE WHEN max(event_id) % 7 <> 0 THEN max(event_id) END AS view_id
        | FROM events WHERE event_type = 'view' GROUP BY 1, 2),
        |p AS (SELECT event_id, user_id, ts FROM events
        | WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id, p.ts, v.view_id, v.ts AS right_ts
        |FROM p ASOF LEFT JOIN v
        | ON p.user_id = v.user_id AND p.ts >= v.ts""".stripMargin,
    "q49_interval_join" ->
      """WITH o AS (SELECT user_id, event_id, ts,
        |  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        | FROM events WHERE user_id % 50 = 0),
        |m AS (SELECT *, CASE WHEN prev_ts IS NULL
        |  OR date_diff('second', prev_ts, ts) > 1800 THEN 1 ELSE 0 END AS new_s FROM o),
        |s AS (SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS UNBOUNDED PRECEDING) AS session_seq FROM m),
        |sess AS (SELECT user_id, session_seq,
        |  min(ts) AS session_start, max(ts) AS session_end
        | FROM s GROUP BY user_id, session_seq),
        |iv AS (SELECT user_id * 100000 + session_seq AS iv_id,
        |  CAST(floor(epoch(session_start)) AS BIGINT) AS s,
        |  CAST(floor(epoch(session_end)) AS BIGINT) AS e
        | FROM sess)
        |SELECT CAST(a.iv_id AS BIGINT) AS id_a, CAST(b.iv_id AS BIGINT) AS id_b
        |FROM iv a JOIN iv b
        | ON a.iv_id < b.iv_id AND a.s <= b.e AND b.s <= a.e""".stripMargin,
    "q50_hll_reagg" ->
      """WITH t AS (SELECT source, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |tt AS (SELECT source, token FROM t WHERE len(token) > 0)
        |SELECT source, CAST(count(DISTINCT token) AS BIGINT) AS exact_distinct,
        | TRUE AS est_within_5pct
        |FROM tt GROUP BY source
        |UNION ALL
        |SELECT '__all', CAST(count(DISTINCT token) AS BIGINT), TRUE FROM tt""".stripMargin,
    "q51_cooccurrence" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |d AS (SELECT DISTINCT doc_id, tok FROM t WHERE len(tok) > 0)
        |SELECT a.tok AS tok_a, b.tok AS tok_b, count(*) AS n_docs
        |FROM d a JOIN d b ON a.doc_id = b.doc_id AND a.tok < b.tok
        |GROUP BY 1, 2
        |ORDER BY n_docs DESC, tok_a ASC, tok_b ASC
        |LIMIT 20""".stripMargin,
    "q52_cohort_retention" ->
      """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
        |c AS (SELECT user_id, min(day) AS cohort_day FROM e GROUP BY 1)
        |SELECT c.cohort_day,
        | CAST(date_diff('day', c.cohort_day, e.day) AS INTEGER) AS days_since,
        | CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
        |FROM e JOIN c ON e.user_id = c.user_id
        |GROUP BY 1, 2""".stripMargin,
    "q53_sliding_windows" ->
      """WITH x AS (SELECT event_type, value, epoch(ts) AS ep FROM events),
        |w AS (SELECT event_type, value, ep,
        |  (CAST(floor(ep / 900) AS BIGINT) - g.g) * 900 AS ws
        | FROM x, generate_series(0, 3) g(g))
        |SELECT ws, event_type, count(*) AS cnt,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM w WHERE ws <= ep AND ep < ws + 3600
        |GROUP BY 1, 2""".stripMargin,
    "q54_scd2_versions" ->
      """WITH o AS (SELECT user_id, event_id, ts, event_type AS state,
        |  lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        | FROM events),
        |ch AS (SELECT user_id, event_id, ts, state FROM o
        | WHERE prev IS NULL OR prev <> state)
        |SELECT user_id, state, ts AS valid_from,
        | lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
        | lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |  AS is_current
        |FROM ch""".stripMargin,
    "q55_column_profile" -> {
      val profiled = Seq(
        ("o_orderkey", "o_orderkey"),
        ("o_custkey", "o_custkey"),
        ("o_orderstatus", "o_orderstatus"),
        ("o_totalprice", "CAST(o_totalprice AS DECIMAL(18,2))"),
        ("o_orderdate", "o_orderdate"),
        ("o_orderpriority", "o_orderpriority"))
      profiled.map { case (name, e) =>
        s"""SELECT '$name' AS column, count(*) AS n_rows,
           | CAST(SUM(CASE WHEN ($e) IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           | CAST(count(DISTINCT ($e)) AS BIGINT) AS n_distinct,
           | CAST(min($e) AS VARCHAR) AS min_str,
           | CAST(max($e) AS VARCHAR) AS max_str
           |FROM orders""".stripMargin
      }.mkString("\nUNION ALL\n")
    })
}
