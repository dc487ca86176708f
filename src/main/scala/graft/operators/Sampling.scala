package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data curation.
  *
  * Random sampling (`df.sample`) is partition-order-dependent and not
  * reproducible across engines, retries or re-runs — poison for an
  * exactly-once curation pipeline and impossible to oracle-check. These
  * operators decide membership from a HASH of the row's identity instead:
  * keep a row iff the first 16 bits of md5(stratum|id) fall under the
  * stratum's threshold. Properties that matter at 100 TB:
  *  - stateless and embarrassingly parallel (no RNG state, no shuffle);
  *  - stable: the same row is kept in every re-run, on any engine;
  *  - mergeable: a sample of a union = union of the samples.
  */
object Sampling {

  /** 16-bit bucket of md5(stratum|id) — uniform over [0, 65536). */
  private def bucket(stratum: Column, id: Column): Column =
    conv(substring(md5(concat(stratum, lit("|"), id.cast("string"))), 1, 4),
      16, 10).cast("int")

  /** Per-stratum deterministic sample. `rates` maps stratum value → keep
    * rate in [0,1]; unlisted strata use `defaultRate`. Thresholds are
    * floor(rate * 65536), so rate=1.0 keeps everything and rate=0 nothing.
    */
  def stratified(df: DataFrame, strataCol: String, idCol: String,
      rates: Map[String, Double], defaultRate: Double): DataFrame = {
    require((rates.values.toSeq :+ defaultRate).forall(r => r >= 0 && r <= 1),
      s"rates must be in [0,1]: $rates / $defaultRate")
    def threshold(rate: Double): Column = lit((rate * 65536).toInt)
    val thr = rates.foldLeft(threshold(defaultRate)) { case (acc, (value, rate)) =>
      when(col(strataCol) === value, threshold(rate)).otherwise(acc)
    }
    df.filter(bucket(col(strataCol), col(idCol)) < thr)
  }

  /** Flat deterministic sample at a single rate (stratum = the constant). */
  def deterministic(df: DataFrame, idCol: String, rate: Double): DataFrame =
    stratified(df.withColumn("__s", lit("all")), "__s", idCol,
      Map.empty, rate).drop("__s")

  /** Deterministic per-source hash order: stable, engine-reproducible, and
    * uncorrelated with any data column — the "random but repeatable" order
    * the budget/cap operators admit rows in.
    */
  private def hashOrder(stratum: Column, id: Column): Column =
    md5(concat(stratum, lit("|"), id.cast("string")))

  /** Token-budgeted corpus assembly (training-data mixing): per source,
    * admit documents in deterministic hash order until the source's token
    * budget is reached — a document is admitted iff the running token sum
    * INCLUDING it stays within budget. Budgets are exact and reproducible:
    * the same corpus + budgets always selects the same documents, on any
    * engine.
    *
    * Scale shape: a naive `Window.partitionBy(source)` running sum puts
    * EVERY row of a source through one task — a training mix has few
    * sources and huge ones (a 40 TB crawl slice = one task), so the
    * prefix sum is computed in two passes instead:
    *  1. rows are bucketed by the first `bucketChars` hex chars of their
    *     order hash (a PREFIX of the order key, so bucket order equals
    *     hash order — md5 hex strings compare lexicographically the same
    *     as numerically); per-(source, bucket) token subtotals are a tiny
    *     frame (sources × 16^bucketChars rows);
    *  2. cumulative bucket offsets come from a window over that tiny
    *     frame, broadcast back, and each row's global running sum =
    *     its bucket's offset + a running sum local to its bucket.
    * The corpus body crosses the wire once (the (source, bucket)
    * exchange feeding the local window); no window partition ever holds
    * more than ~1/16^bucketChars of a source. Identical output to the
    * single-window form for any bucketChars.
    */
  def tokenBudget(df: DataFrame, sourceCol: String, idCol: String,
      tokenCountCol: String, budgets: Map[String, Long],
      defaultBudget: Long, bucketChars: Int = 3): DataFrame = {
    require((budgets.values.toSeq :+ defaultBudget).forall(_ >= 0),
      s"budgets must be >= 0: $budgets / $defaultBudget")
    require(bucketChars >= 1 && bucketChars <= 8,
      s"bucketChars must be in [1,8], got $bucketChars")
    val budget = budgets.foldLeft(lit(defaultBudget)) {
      case (acc, (value, b)) => when(col(sourceCol) === value, lit(b)).otherwise(acc)
    }
    // the keyed frame feeds BOTH passes (the subtotal aggregate and the
    // local-window body), and the two consumers sit under different shuffle
    // boundaries, so without storage the scan + order-hash would execute
    // twice per row. A LAZY local checkpoint stores partitions on first
    // computation (the offsets broadcast job) and serves the window pass
    // from storage — one scan, one hash per row, no extra job. At bench
    // scale this is noise (the query is stage-floor-dominated); the point
    // is the 100 TB scan economics, where reading the corpus once instead
    // of twice is the dominant term. Same materialize-once pattern as
    // ngramJaccardPairs' posting frame; on a cluster, executor loss
    // invalidates local checkpoints — acceptable for a deterministic batch
    // stage that re-runs.
    val withKey = df
      .withColumn("__h", hashOrder(col(sourceCol), col(idCol)))
      .withColumn("__b", substring(col("__h"), 1, bucketChars))
      .localCheckpoint(false)
    // pass 1: per-bucket subtotals (tiny: sources × 16^bucketChars rows —
    // structurally bounded, so no guard count job); the offset window
    // runs over this aggregate, never the corpus (the shared
    // BucketedOffsets core, r11 verdict #3)
    val offsets = BucketedOffsets.frame(withKey,
      keyCol = col(sourceCol), bucketCol = col("__b"),
      cAgg = sum(col(tokenCountCol).cast("long")), extras = Seq.empty,
      withTotal = false, materialize = false, maxRows = -1L,
      op = "tokenBudget", hint = "")
    // pass 2: running sum local to each (source, bucket) partition —
    // bounded tasks even when one source is 90% of the corpus. The offset
    // join is NULL-SAFE: a null source or id hashes to a null bucket, and
    // the single-window form kept such rows (nulls form their own window
    // partition) — a plain using-columns join would silently drop them
    val wLocal = Window.partitionBy(col(sourceCol), col("__b"))
      .orderBy(col("__h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withKey
      .join(broadcast(offsets),
        col(sourceCol) <=> col("__okey") && col("__b") <=> col("__ocb"))
      .withColumn("__cum_tokens",
        col("__off") + sum(col(tokenCountCol).cast("long")).over(wLocal))
      .filter(col("__cum_tokens") <= budget)
      .select(df.columns.map(col): _*)
  }

  /** Exact `ntile(n)` within each key, ordered by (`orderCol` DESC,
    * `idCol` ASC), WITHOUT a per-key global sort — the scale-safe form of
    * `ntile(n).over(Window.partitionBy(key).orderBy(order.desc, id))`.
    *
    * A key column with small, fixed cardinality (languages, sources)
    * makes the window form a single-task sort per key value: at corpus
    * scale each head key is terabytes through ONE task. Here the rank is
    * computed with the same two-pass bucketed prefix idiom as
    * [[tokenBudget]]:
    *  1. rows land in coarse order-aligned buckets
    *     (`floor(-order · coarseScale)` — monotone in the DESC order, so
    *     bucket order equals sort order; ties share a bucket and resolve
    *     locally by the id tiebreak);
    *  2. per-(key, bucket) counts are a tiny frame; cumulative offsets
    *     and the per-key total come from windows over THAT frame and
    *     broadcast back;
    *  3. each row's exact global rank = its bucket's offset + a rank
    *     local to the (key, bucket) partition — bounded tasks however
    *     skewed the keys;
    *  4. the ntile bucket is pure arithmetic on (rank, total): the first
    *     `total mod n` buckets take `total div n + 1` rows, the rest
    *     `total div n` — byte-identical to the window `ntile`.
    *
    * `coarseScale` only tunes bucket granularity (any value yields
    * identical output); pick it so ~corpus/(keys·scale·spread) rows share
    * a bucket. Degenerate TIES are handled exactly (r10 verdict watch):
    * a bucket whose order values are ALL EQUAL (quantized gates, constant
    * scores — min <=> max over the bucket) ranks by the id tiebreak
    * alone, and any monotone-in-id coarse split preserves that rank, so
    * oversized fully-tied buckets (count > `tieIdScale`) are refined into
    * id sub-buckets of ~`tieIdScale` rows — the same offset+local-rank
    * trick one level deeper, byte-identical output (spec-pinned against
    * the window ntile on an all-tied corpus). A bucket that concentrates
    * DISTINCT scores remains one rank partition — there coarseScale is
    * the dial and the guarded count frame the audit surface. NaN order
    * values sort GREATER than every double in Spark — FIRST under DESC —
    * so they route to a dedicated min-long bucket (r10 advice:
    * `floor(NaN·scale)` casts to 0, interleaving NaN with real scores);
    * within it min <=> max holds (Spark NaN = NaN), so the id refinement
    * applies. Both broadcast count frames are fail-loud bounded by
    * `maxBucketFrameRows` instead of OOMing the driver (r10 advice).
    */
  def ntileDescBucketed(df: DataFrame, keyCol: String, orderCol: String,
      idCol: String, n: Int, outCol: String,
      coarseScale: Double = 16.0, tieIdScale: Long = 4096L,
      maxBucketFrameRows: Long = 4000000L): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    require(coarseScale > 0, s"coarseScale must be > 0, got $coarseScale")
    require(tieIdScale >= 0, s"tieIdScale must be >= 0 (0 = off), got $tieIdScale")
    // one scan feeds both passes (the tokenBudget materialize-once note).
    // Null order keys reproduce the window form's DESC default (NULLS
    // LAST): they land in a dedicated max-long bucket after every real
    // score bucket, tie-broken by id inside it (parity spec pins this);
    // NaN routes to the min-long bucket — FIRST under DESC. Both
    // policies live in the shared BucketedOffsets core (r11 verdict #3)
    val withKey = df
      .withColumn("__cb", BucketedOffsets.coarseBucket(col(orderCol),
        coarseScale, desc = true, nullBucket = Some(Long.MaxValue)))
      .localCheckpoint(false)
    // the count frame materializes so the guard count, the refinement
    // probe, and the broadcast join all ride one computation, and the
    // key-alone windows never see corpus rows
    val offsets = BucketedOffsets.frame(withKey,
      keyCol = col(keyCol), bucketCol = col("__cb"),
      cAgg = count(lit(1)),
      extras = Seq((min(col(orderCol)) <=> max(col(orderCol))).as("__tied")),
      withTotal = true, materialize = true, maxRows = maxBucketFrameRows,
      op = "ntileDescBucketed",
      hint = "lower coarseScale or raise maxBucketFrameRows")
    // rank → ntile bucket: the first (__n % n) buckets hold (__n DIV n)+1
    // rows; q = 0 keys (fewer rows than buckets) never reach the ELSE
    // branch, so its DIV is never by zero
    def finish(ranked: DataFrame): DataFrame = ranked
      .withColumn(outCol, expr(
        s"CAST(CASE WHEN __r <= ((__n DIV $n) + 1) * (__n % $n) " +
          s"THEN (__r - 1) DIV ((__n DIV $n) + 1) + 1 " +
          s"ELSE (__n % $n) + (__r - 1 - ((__n DIV $n) + 1) * (__n % $n)) " +
          s"DIV (__n DIV $n) + 1 END AS INT)"))
      .select(df.columns.map(col) :+ col(outCol): _*)
    val joined = withKey.join(broadcast(offsets),
      col(keyCol) <=> col("__okey") && col("__cb") <=> col("__ocb"))
    // the id refinement engages ONLY when some bucket is both fully tied
    // and oversized — one probe of the materialized count frame decides
    // (a heavy run with continuous scores pays nothing beyond the tied
    // flag in the counts aggregate); deterministic given the data.
    // GATED on an integral id type (r11 advice): the sub-bucket split
    // floor(id / tieIdScale) must be monotone in the id tiebreak order,
    // which holds for byte/short/int/long ids but NOT for strings
    // (lexical "10" < "9" while 10 > 9 numerically — and a non-numeric
    // cast yields null, silently dropping rows through the join). A
    // non-integral id falls back to the unrefined single-partition rank
    // for the tied bucket — always correct, just not split.
    val idIsIntegral = {
      import org.apache.spark.sql.types._
      df.schema(idCol).dataType match {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      }
    }
    val needsRefine = tieIdScale > 0 && idIsIntegral && !offsets
      .filter(col("__tied") && col("__c") > tieIdScale).isEmpty
    if (!needsRefine) {
      val wLocal = Window.partitionBy(col(keyCol), col("__cb"))
        .orderBy(col(orderCol).desc, col(idCol))
      finish(joined.withColumn("__r",
        col("__off") + row_number().over(wLocal).cast("long")))
    } else {
      // oversized fully-tied buckets: rank inside such a bucket is id
      // order, and floor(id / tieIdScale) is monotone in id, so
      // (sub-bucket offset + sub-bucket-local rank) = the exact
      // bucket-local rank. Mixed-score buckets keep __ib = 0 (the split
      // would not respect (order DESC, id) there). Null ids land in a
      // null sub-bucket that windows FIRST — matching their NULLS-FIRST
      // position in the ASC id tiebreak — and survive the join via <=>
      // (r11 advice: === dropped them).
      val refined = joined.withColumn("__ib",
        when(col("__tied") && col("__c") > tieIdScale,
          floor(col(idCol).cast("double") / tieIdScale).cast("long"))
          .otherwise(lit(0L)))
      val subOffsets = BucketedOffsets.frame(refined,
        keyCol = struct(col(keyCol), col("__cb")), bucketCol = col("__ib"),
        cAgg = count(lit(1)), extras = Seq.empty,
        withTotal = false, materialize = true,
        maxRows = maxBucketFrameRows, op = "ntileDescBucketed",
        hint = "raise tieIdScale or maxBucketFrameRows")
        .select(col("__okey.*"), col("__ocb").as("__sib"),
          col("__off").as("__soff"))
        .toDF("__skey", "__scb", "__sib", "__soff")
      val wLocal = Window.partitionBy(col(keyCol), col("__cb"), col("__ib"))
        .orderBy(col(orderCol).desc, col(idCol))
      finish(refined
        .join(broadcast(subOffsets),
          col(keyCol) <=> col("__skey") && col("__cb") <=> col("__scb") &&
            col("__ib") <=> col("__sib"))
        .withColumn("__r", col("__off") + col("__soff") +
          row_number().over(wLocal).cast("long")))
    }
  }

  /** Temperature-scaled source mixing weights (r11) — the data-recipe
    * step that DERIVES the weights [[weightedMix]] consumes (the GPT-3 /
    * LLaMA-style recipe: sampling probability ∝ count^α, flattening the
    * natural distribution toward small sources as α falls). α is
    * restricted to the IEEE-exact dials {1, 1/2}: count and
    * sqrt(count) are correctly rounded on every engine, while a general
    * pow() is libm-dependent and would break cross-engine hashing — and
    * α = 1/2 is the canonical flattening step between natural and
    * heavily-tempered mixes. Per source: token count, the α = 1/2
    * weight, each dial's share of the LARGEST source, and the implied
    * upsampling boost of the flattened dial over natural (how many
    * effective extra epochs the small source gets). Corpus work: ONE
    * partial-aggregated census; everything after is
    * source-cardinality-sized arithmetic (the max is a driver long).
    */
  def temperatureWeights(docs: DataFrame, sourceCol: String,
      nTokensCol: String): DataFrame = {
    val per = docs.groupBy(col(sourceCol))
      .agg(sum(col(nTokensCol).cast("long")).as("n_tok"))
      .localCheckpoint(false)
    // null-safe max read (r11 advice): an empty corpus yields zero rows
    // and an all-null token column a null max — either must reach the
    // friendly require, not NPE inside getLong
    val mxRow = per.agg(max(col("n_tok"))).head
    val mx = if (mxRow.isNullAt(0)) 0L else mxRow.getLong(0)
    require(mx >= 1,
      "temperatureWeights: empty corpus (no rows or all-null token counts)")
    per
      .withColumn("w_half", sqrt(col("n_tok").cast("double")))
      .withColumn("r_flat", col("n_tok").cast("double") / lit(mx.toDouble))
      .withColumn("r_half",
        sqrt(col("n_tok").cast("double")) / lit(math.sqrt(mx.toDouble)))
      .withColumn("boost_half", col("r_half") / col("r_flat"))
  }

  /** Deterministic per-key cap ("reservoir" with a hash instead of RNG):
    * keep at most `k` rows per key, chosen by the stable hash order — the
    * per-source row cap a mixing pipeline applies before interleaving.
    * Single shuffle on the key; row_number and filter share it.
    */
  def perKeyCap(df: DataFrame, keyCol: String, idCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val w = Window.partitionBy(keyCol)
      .orderBy(hashOrder(col(keyCol), col(idCol)), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Sequence packing (GPT-style concatenate-and-chunk): documents are
    * laid out in the deterministic hash order and split into fixed
    * `seqLen`-token training sequences; each document learns its byte —
    * token — position in that layout: global `start_offset`, the
    * `first_seq`/`last_seq` sequence indices it lands in (a document
    * spans sequences when it crosses a boundary), and `n_seqs`. The
    * downstream writer can then route each document's tokens to its
    * sequence shards without any global sort.
    *
    * Scale shape: the global running offset is the same two-pass bucketed
    * prefix sum as [[tokenBudget]] — per-bucket subtotals (16^bucketChars
    * rows), offsets via a window over that tiny frame, a bucket-local
    * running sum for the body — so no task ever sees more than
    * ~1/16^bucketChars of the corpus even though the order is corpus-global.
    */
  def packSequences(df: DataFrame, idCol: String, tokenCountCol: String,
      seqLen: Long, bucketChars: Int = 3): DataFrame = {
    require(seqLen >= 1, s"seqLen must be >= 1, got $seqLen")
    require(bucketChars >= 1 && bucketChars <= 8,
      s"bucketChars must be in [1,8], got $bucketChars")
    val withKey = df
      .withColumn("__h", hashOrder(lit("pack"), col(idCol)))
      .withColumn("__b", substring(col("__h"), 1, bucketChars))
      .localCheckpoint(false)
    // the shared core with a CONSTANT key: one global layout, the offset
    // window runs over the 16^bucketChars-row frame only (r11 verdict #3)
    val offsets = BucketedOffsets.frame(withKey,
      keyCol = lit("pack"), bucketCol = col("__b"),
      cAgg = sum(col(tokenCountCol).cast("long")), extras = Seq.empty,
      withTotal = false, materialize = false, maxRows = -1L,
      op = "packSequences", hint = "")
    val wLocal = Window.partitionBy(col("__b"))
      .orderBy(col("__h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    withKey
      .join(broadcast(offsets), col("__b") <=> col("__ocb"))
      .withColumn("start_offset",
        col("__off") + coalesce(
          sum(col(tokenCountCol).cast("long")).over(wLocal), lit(0L)))
      // floor over an explicit double division: exact for token offsets
      // up to 2^53, and the same arithmetic the SQL oracle runs
      .withColumn("first_seq",
        floor(col("start_offset") / lit(seqLen.toDouble)))
      .withColumn("last_seq",
        floor((col("start_offset")
          + greatest(col(tokenCountCol).cast("long"), lit(1L)) - 1)
          / lit(seqLen.toDouble)))
      .withColumn("n_seqs", col("last_seq") - col("first_seq") + 1)
      .select((df.columns.map(col) ++ Seq(col("start_offset"),
        col("first_seq"), col("last_seq"), col("n_seqs"))): _*)
  }

  /** Per-shard sequence packing over an ORDERED manifest (r15, the q68
    * trainer-path closer): [[packSequences]] packs the raw corpus in the
    * hash order it invents; the production consumer instead packs the
    * epoch-stream manifest ([[epochShuffle]] output) — per shard, in the
    * EXISTING (shard, pos) order, concatenating instance token counts
    * into fixed `seqLen`-token training sequences. Each instance learns
    * its within-shard token `start_offset` and the shard-local
    * `first_seq`/`last_seq`/`n_seqs` sequence indices it lands in.
    *
    * Scale shape: the per-shard running token offset is the same
    * two-pass bucketed prefix sum as [[packSequences]], with the bucket
    * the RANGE block `(pos - 1) DIV blockRows` — order-aligned with pos
    * by construction, so no per-shard single-task sort and no task ever
    * sums more than `blockRows` rows even though the offset is
    * shard-global. The per-(shard, block) frame is materialized and
    * fail-loud bounded before broadcast.
    *
    * `orderCol` must be a positive integral total order within each key
    * (the [[epochShuffle]] `pos` contract — 1-based dense ranks satisfy
    * it); duplicates would make the running sum nondeterministic and
    * values < 1 would alias block 0, so both fail loud — validated from
    * the tiny offsets frame, riding the count pass (no dedicated scan).
    */
  def packStream(df: DataFrame, keyCol: String, orderCol: String,
      tokenCountCol: String, seqLen: Long, blockRows: Long = 65536L,
      bucketRowCap: Long = 2000000L): DataFrame = {
    require(seqLen >= 1, s"seqLen must be >= 1, got $seqLen")
    require(blockRows >= 1, s"blockRows must be >= 1, got $blockRows")
    for (c <- Seq("start_offset", "first_seq", "last_seq", "n_seqs", "__b"))
      require(!df.columns.contains(c),
        s"packStream: column '$c' is an output/internal name — rename " +
          "it before calling")
    val withKey = df
      .withColumn("__b", expr(s"(`$orderCol` - 1L) DIV ${blockRows}L"))
      .localCheckpoint(false)
    val offsets = BucketedOffsets.frame(withKey,
      keyCol = col(keyCol), bucketCol = col("__b"),
      cAgg = sum(col(tokenCountCol).cast("long")),
      extras = Seq(count(lit(1)).as("__pc"),
        countDistinct(col(orderCol)).as("__pd"),
        min(col(orderCol).cast("long")).as("__pmin")),
      withTotal = false, materialize = true, maxRows = bucketRowCap,
      op = "packStream", hint = "raise blockRows")
    val v = offsets.agg(sum(when(col("__pc") =!= col("__pd"), 1L)
        .otherwise(0L)), min(col("__pmin"))).head
    require(v.getLong(0) == 0L,
      s"packStream: order '$orderCol' has duplicate values within a key " +
        "block — the running offset would be nondeterministic")
    require(!v.isNullAt(1) && v.getLong(1) >= 1L,
      s"packStream: order '$orderCol' must be >= 1 (1-based positions), " +
        s"got min ${v.get(1)}")
    val wLocal = Window.partitionBy(col(keyCol), col("__b"))
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    withKey
      .join(broadcast(offsets.drop("__pc", "__pd", "__pmin")),
        col(keyCol) <=> col("__okey") && col("__b") <=> col("__ocb"))
      .withColumn("start_offset",
        col("__off") + coalesce(
          sum(col(tokenCountCol).cast("long")).over(wLocal), lit(0L)))
      // floor over an explicit double division: exact for token offsets
      // up to 2^53 (100 T tokens per shard is ~2^47), and the same
      // arithmetic the SQL oracle runs
      .withColumn("first_seq",
        floor(col("start_offset") / lit(seqLen.toDouble)))
      .withColumn("last_seq",
        floor((col("start_offset")
          + greatest(col(tokenCountCol).cast("long"), lit(1L)) - 1)
          / lit(seqLen.toDouble)))
      .withColumn("n_seqs", col("last_seq") - col("first_seq") + 1)
      .select((df.columns.map(col) ++ Seq(col("start_offset"),
        col("first_seq"), col("last_seq"), col("n_seqs"))): _*)
  }

  /** Deterministic epoch shuffle (r13): the training-ORDER step a shard
    * writer runs after curation — every document gets a shard and a
    * 1-based position within that shard under the seed's pseudo-random
    * permutation (order = md5("epoch<seed>|" + id), the [[stratified]]
    * hash discipline), so the read order is "random" yet exactly
    * reproducible on any engine and any partitioning, and a re-run with
    * a new seed is a fresh epoch permutation. Shard assignment is the
    * hash's own 16-bit bucket mod `nShards`: stable under corpus growth
    * (an existing document never changes shard), uniform, and
    * uncorrelated with any data column.
    *
    * Scale shape: a naive `Window.partitionBy(shard)` rank would sort
    * each shard's FULL row set on one task — at 100 TB / 1024 shards
    * that is ~100 GB per task. Instead the rank rides the
    * [[BucketedOffsets]] two-pass prefix idiom on (shard, hash-prefix
    * bucket): per-(shard, bucket) counts form a tiny frame (≤ nShards ×
    * 16^bucketChars rows), offsets broadcast back, and the residual
    * row_number runs inside (shard, bucket) partitions — bounded tasks
    * at any corpus size. The hash-prefix bucket is order-aligned by
    * construction (it IS a prefix of the order key).
    */
  def epochShuffle(df: DataFrame, idCol: String, seed: Long, nShards: Int,
      bucketChars: Int = 3): DataFrame =
    shuffleRank(df, idCol, s"epoch$seed", nShards, bucketChars,
      tier = None, op = "epochShuffle")

  /** Curriculum shuffle (r14): [[epochShuffle]] with a TIER-MAJOR order
    * inside every shard — the curriculum-scheduling step ("train
    * short/easy documents first"): within a shard, all tier-0 documents
    * precede all tier-1 documents, and inside one tier the order is the
    * seed's md5 permutation (so the curriculum is still shuffled, just
    * stratified by difficulty). Shard assignment stays the hash's own
    * bucket — uniform and tier-uncorrelated, so every shard sees the
    * same curriculum ramp.
    *
    * Scale shape: identical to [[epochShuffle]] — the rank rides the
    * bucketed two-pass prefix idiom with the bucket string
    * `zero-padded tier ++ hash prefix`, which is order-aligned with
    * (tier ASC, hash ASC) by construction; no per-shard single-task
    * sort at any corpus size. Tier values must be non-null, integral
    * (a fractional tier would silently truncate in the bucket while the
    * output keeps the original value — r14 advice) and in [0, 9999]
    * (the zero-pad width that keeps string order = numeric order).
    * The validation rides the offsets count pass as `extras` (r14
    * verdict #1: a dedicated full-corpus min/max scan just to check the
    * dial was a third corpus read at the 100 TB point) and fails loud
    * from the tiny materialized frame before the window runs.
    */
  def curriculumShuffle(df: DataFrame, idCol: String, tierCol: String,
      seed: Long, nShards: Int, bucketChars: Int = 3): DataFrame =
    shuffleRank(df, idCol, s"curr$seed", nShards, bucketChars,
      tier = Some(tierCol), op = "curriculumShuffle")

  /** Shared (shard, pos) builder for [[epochShuffle]] /
    * [[curriculumShuffle]] — see epochShuffle's scaladoc for the
    * two-pass bucketed-prefix scale argument. `tier` prepends a
    * zero-padded tier to the bucket string, making the within-shard
    * order tier-major.
    */
  private def shuffleRank(df: DataFrame, idCol: String, tag: String,
      nShards: Int, bucketChars: Int, tier: Option[String],
      op: String): DataFrame = {
    require(nShards >= 1 && nShards <= 65536,
      s"nShards must be in [1, 65536], got $nShards")
    require(bucketChars >= 1 && bucketChars <= 8,
      s"bucketChars must be in [1,8], got $bucketChars")
    // fail loud on caller columns the builder would silently overwrite
    // (the clusterSafeSplit collision discipline, r13 advice): "shard"
    // and "pos" are output names, "__h"/"__b" are internals
    for (c <- Seq("shard", "pos", "__h", "__b"))
      require(!df.columns.contains(c),
        s"$op: input already has a '$c' column — rename it " +
          "before calling (it would be overwritten or shadow data)")
    val prefix = substring(col("__h"), 1, bucketChars)
    val withKey = df
      .withColumn("__h", hashOrder(lit(tag), col(idCol)))
      .withColumn("shard",
        conv(substring(col("__h"), 1, 4), 16, 10).cast("long")
          % lit(nShards.toLong))
      .withColumn("__b", tier match {
        case Some(t) =>
          concat(lpad(col(t).cast("long").cast("string"), 4, "0"), prefix)
        case None => prefix
      })
      .localCheckpoint(false)
    // tier-dial validation rides the count pass as extras (no dedicated
    // corpus scan — r14 verdict #1) and the frame is materialized and
    // fail-loud bounded BEFORE it is broadcast to every executor (r14
    // advice: the tier prefix multiplies bucket cardinality by up to
    // 10^4 tiers on top of nShards x 16^bucketChars; 2M rows x ~60 B is
    // the ~100 MB broadcast ceiling)
    val tierExtras = tier.toSeq.flatMap { t => Seq(
      min(col(t).cast("long")).as("__tmin"),
      max(col(t).cast("long")).as("__tmax"),
      // a fractional tier passes the min/max range check after the long
      // cast but silently truncates in the bucket; a null tier routes to
      // a null bucket — both must fail loud (r14 advice)
      sum(when(col(t).isNull || col(t) =!= col(t).cast("long"), 1L)
        .otherwise(0L)).as("__tbad")) }
    val offsets = BucketedOffsets.frame(withKey,
      keyCol = col("shard"), bucketCol = col("__b"),
      cAgg = count(lit(1)), extras = tierExtras,
      withTotal = false, materialize = true, maxRows = 2000000L,
      op = op, hint = "reduce bucketChars, nShards, or tier cardinality")
    for (t <- tier) {
      val r = offsets.agg(sum(col("__tbad")), min(col("__tmin")),
        max(col("__tmax"))).head
      require(r.getLong(0) == 0L,
        s"$op: tier '$t' has ${r.getLong(0)} null or non-integral " +
          "values — the bucket would truncate or null-route them")
      require(r.getLong(1) >= 0L && r.getLong(2) <= 9999L,
        s"$op: tier '$t' must be in [0, 9999] (the zero-pad width), " +
          s"got [${r.getLong(1)}, ${r.getLong(2)}]")
    }
    val wLocal = Window.partitionBy(col("shard"), col("__b"))
      .orderBy(col("__h"), col(idCol))
    withKey
      .join(broadcast(offsets.drop("__tmin", "__tmax", "__tbad")),
        col("shard") <=> col("__okey") && col("__b") <=> col("__ocb"))
      .withColumn("pos",
        col("__off") + row_number().over(wLocal).cast("long"))
      .select((df.columns.map(col) ++ Seq(col("shard"), col("pos"))): _*)
  }

  /** Token-budget allocation across sources (r13): the data-recipe
    * PLANNING table — given each source's available tokens and the
    * [[temperatureWeights]] α = 1/2 flattening, how many tokens of a
    * global training budget each source contributes and how many
    * effective epochs of it that implies (the LLaMA-style "sampling
    * prop / epochs" table). All cross-engine-exact: the weight is
    * `floor(sqrt(n_tok) · 2^20)` (sqrt is correctly rounded everywhere,
    * the floor quantizes it to a long), the allocation is integer
    * arithmetic `budget · wq DIV Σwq`, and epochs is ONE double division
    * of two exact longs — no float summation anywhere, so the oracle
    * hash-matches bit-for-bit (the q62 discipline; a float Σw would be
    * summation-order-dependent).
    *
    * Scale: one partial-aggregated census pass; everything after is
    * source-cardinality arithmetic (Σwq is a window over the tiny
    * per-source frame).
    */
  def epochAllocation(docs: DataFrame, sourceCol: String,
      nTokensCol: String, budgetTokens: Long,
      weightScale: Long = 1L << 20): DataFrame = {
    require(budgetTokens >= 1, s"budgetTokens must be >= 1, got $budgetTokens")
    require(weightScale >= 1, s"weightScale must be >= 1, got $weightScale")
    // same collision discipline: the output/internal names must not
    // collide with the caller's source column (the grouped frame would
    // silently shadow it)
    for (c <- Seq("n_tok", "wq", "target_tokens", "epochs", "upsampled"))
      require(sourceCol != c && nTokensCol != c,
        s"epochAllocation: column '$c' is an output name — rename the " +
          "source/token column before calling")
    epochAllocationFromCensus(
      docs.groupBy(col(sourceCol))
        .agg(sum(col(nTokensCol).cast("long")).as("n_tok")),
      sourceCol, budgetTokens, weightScale)
  }

  /** [[epochAllocation]] from a pre-computed per-source token census
    * `(sourceCol, n_tok)` — the MAINTAINED-state entry point: a streaming
    * pipeline folds per-batch census deltas into a durable store (token
    * counts are mergeable longs, so merged == one-shot exactly) and keeps
    * a continuously current allocation table without re-scanning history
    * (st72). Identical arithmetic to the one-shot form by construction —
    * this IS the one-shot form's tail.
    */
  def epochAllocationFromCensus(census: DataFrame, sourceCol: String,
      budgetTokens: Long, weightScale: Long = 1L << 20): DataFrame = {
    require(budgetTokens >= 1, s"budgetTokens must be >= 1, got $budgetTokens")
    require(weightScale >= 1, s"weightScale must be >= 1, got $weightScale")
    require(census.columns.toSet == Set(sourceCol, "n_tok"),
      s"epochAllocationFromCensus: census must be exactly ($sourceCol, " +
        s"n_tok), got ${census.columns.mkString(", ")}")
    // quantized sqrt weight: the 2^20 default keeps sqrt(n_tok) exact to
    // ~1e-6 relative; the per-source frame is model-sized, so Σwq and
    // max(wq) are two driver longs (the temperatureWeights idiom)
    val wq = census
      .filter(col("n_tok") > 0)
      .withColumn("wq",
        floor(sqrt(col("n_tok").cast("double")) * lit(weightScale.toDouble))
          .cast("long"))
      .localCheckpoint(false)
    val row = wq.agg(sum(col("wq")), max(col("wq"))).head
    require(!row.isNullAt(0),
      "epochAllocation: empty corpus (no rows or all-null token counts)")
    val (wsum, wmax) = (row.getLong(0), row.getLong(1))
    // fail loud before the 64-bit product can wrap (the
    // requireNoBm25Overflow discipline): budget × wq must fit Int64
    require(BigInt(budgetTokens) * wmax <= Long.MaxValue,
      s"epochAllocation: budget ($budgetTokens) x max weight ($wmax) " +
        "overflows Int64 — reduce weightScale or shard the budget")
    wq
      .withColumn("target_tokens",
        expr(s"(${budgetTokens}L * wq) DIV ${wsum}L"))
      .withColumn("epochs",
        col("target_tokens").cast("double") / col("n_tok").cast("double"))
      .withColumn("upsampled", col("epochs") > 1.0)
      .select(col(sourceCol), col("n_tok"), col("wq"),
        col("target_tokens"), col("epochs"), col("upsampled"))
  }

  /** Epoch materialization (r14): turn [[epochAllocation]]'s PLAN into
    * the per-document integer repeat counts a shard writer consumes —
    * the step between "source X contributes T tokens" and an actual
    * training stream. Each document repeats `target DIV n_tok` times
    * (the whole epochs every document of the source gets), plus ONE
    * extra repeat for a deterministic hash-chosen subset sized so the
    * expected extra tokens equal the fractional remainder
    * `target MOD n_tok`: extra iff `h16 · n_tok < rem · 2^16`, with h16
    * the 16-bit md5 bucket of (seed, id). All-integer and engine-exact
    * (no float epochs anywhere near the decision), stable under re-runs
    * and corpus growth (a document's repeat count changes only if its
    * source's allocation does).
    *
    * Scale: one census pass (inside [[epochAllocation]]), the
    * model-sized allocation broadcast back, one hash projection per
    * row — no shuffle touches the corpus. The h·n_tok product is guarded
    * against Int64 wrap (n_tok < 2^47, i.e. ~140 T tokens per source)
    * the same fail-loud way as the allocation itself.
    */
  def epochMaterialize(docs: DataFrame, sourceCol: String, idCol: String,
      nTokensCol: String, budgetTokens: Long, seed: Long = 7L,
      weightScale: Long = 1L << 20): DataFrame = {
    for (c <- Seq("n_tok", "repeats", "__whole", "__rem"))
      require(!docs.columns.contains(c),
        s"epochMaterialize: column '$c' is an output/internal name — " +
          "rename it before calling")
    val alloc = epochAllocation(docs, sourceCol, nTokensCol, budgetTokens,
        weightScale)
      .select(col(sourceCol), col("n_tok"),
        expr("target_tokens DIV n_tok").as("__whole"),
        expr("target_tokens % n_tok").as("__rem"))
    val g = alloc.agg(max(col("n_tok")), max(col("__whole"))).head
    val maxTok = g.getLong(0)
    require(BigInt(maxTok) * 65536 <= Long.MaxValue,
      s"epochMaterialize: source token count ($maxTok) x 2^16 overflows " +
        "Int64 — shard the source")
    // no real recipe repeats a document a million times — a whole-epoch
    // count past this marks a mis-set budget, and downstream instance
    // materialization (explode over repeats) would be arbitrarily wide
    require(g.getLong(1) <= 1000000L,
      s"epochMaterialize: a source would repeat ${g.getLong(1)} whole " +
        "epochs — budget and corpus are mismatched by >1e6x")
    docs.join(broadcast(alloc), Seq(sourceCol))
      .withColumn("repeats",
        col("__whole") +
          when(bucket(lit(s"mat$seed"), col(idCol)).cast("long")
            * col("n_tok") < col("__rem") * lit(65536L), 1L)
            .otherwise(0L))
      .select(col(idCol), col(sourceCol), col(nTokensCol), col("repeats"))
  }

  /** Mixture-weighted corpus interleave (training-data mixing weights):
    * pick the `n` rows with the smallest weighted rank `r_s / w_s`, where
    * `r_s` is the row's deterministic hash-order rank WITHIN its source
    * and `w_s` the source's mixture weight — source s receives ~w_s/Σw of
    * every prefix of the interleaved stream, the "sampling proportion"
    * knob of an LLM training mix, but exact, reproducible and
    * engine-checkable instead of RNG-driven. A source runs out when
    * exhausted (its ranks stop), and the remaining sources keep their
    * relative proportions — the natural without-replacement semantics.
    *
    * Scale shape: per-source ranks use the same two-pass bucketed prefix
    * trick as [[tokenBudget]] (bucket counts + broadcast offsets + a
    * (source, bucket)-local row_number), so no source ever runs through
    * one task; the global top-n is an `orderBy(...).limit(n)` —
    * TakeOrderedAndProject, a per-partition heap + driver merge of n
    * rows, never a full sort. Ties across equal-weight sources break on
    * the hash then the id, so the selection is total-order deterministic.
    */
  def weightedMix(df: DataFrame, sourceCol: String, idCol: String,
      weights: Map[String, Double], defaultWeight: Double, n: Int,
      bucketChars: Int = 3): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    require((weights.values.toSeq :+ defaultWeight).forall(_ > 0),
      s"weights must be > 0: $weights / $defaultWeight")
    require(bucketChars >= 1 && bucketChars <= 8,
      s"bucketChars must be in [1,8], got $bucketChars")
    val weight = weights.foldLeft(lit(defaultWeight)) {
      case (acc, (value, x)) => when(col(sourceCol) === value, lit(x)).otherwise(acc)
    }
    // same two-consumer materialize-once economics as tokenBudget
    val withKey = df
      .withColumn("__h", hashOrder(col(sourceCol), col(idCol)))
      .withColumn("__b", substring(col("__h"), 1, bucketChars))
      .localCheckpoint(false)
    // per-source ranks through the shared core (r11 verdict #3)
    val offsets = BucketedOffsets.frame(withKey,
      keyCol = col(sourceCol), bucketCol = col("__b"),
      cAgg = count(lit(1)), extras = Seq.empty,
      withTotal = false, materialize = false, maxRows = -1L,
      op = "weightedMix", hint = "")
    val wLocal = Window.partitionBy(col(sourceCol), col("__b"))
      .orderBy(col("__h"), col(idCol))
    withKey
      .join(broadcast(offsets),
        col(sourceCol) <=> col("__okey") && col("__b") <=> col("__ocb"))
      .withColumn("__k",
        (col("__off") + row_number().over(wLocal)).cast("double") / weight)
      .orderBy(col("__k"), col("__h"), col(idCol))
      .limit(n)
      .select(df.columns.map(col): _*)
  }
}
