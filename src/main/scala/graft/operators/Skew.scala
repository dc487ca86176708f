package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew-handling utilities (SURVEY.md §7.4.4: partner-heavy distributions —
  * one payer owning most rows — hit the groupBy(sender, receiver)
  * aggregations).
  *
  * AQE's skew-join splitting covers joins; for aggregations over a skewed
  * key the pattern is two-phase salting: spread each hot key across
  * `salts` sub-groups for the partial aggregate (so no single task owns a
  * hot key's full row set), then merge the partials in a second, tiny
  * aggregate. Only works for algebraic aggregates (sum/count/min/max);
  * countDistinct needs the expand or an HLL sketch instead.
  */
object Skew {

  /** Two-phase salted aggregation. `saltBy` should be any column (or
    * combination) with high cardinality inside hot groups — it only decides
    * how rows spread over partial groups, never the result.
    */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[String],
      saltBy: Column,
      salts: Int,
      aggs: Seq[(String, String)]): DataFrame = {
    require(salts > 0)
    require(aggs.nonEmpty, "saltedAgg needs at least one (fn, column) aggregate")
    require(aggs.distinct.length == aggs.length,
      s"duplicate (fn, column) aggregates would collide on output names: $aggs")
    def partialExpr(fn: String, c: String): Column = fn match {
      case "sum" => sum(col(c))
      case "count" => count(col(c))
      case "min" => min(col(c))
      case "max" => max(col(c))
      case other => throw new IllegalArgumentException(
        s"non-algebraic aggregate '$other' cannot be salted")
    }
    def mergeExpr(fn: String, c: String): Column = fn match {
      case "sum" | "count" => sum(col(s"__p_$fn$c"))
      case "min" => min(col(s"__p_$fn$c"))
      case "max" => max(col(s"__p_$fn$c"))
      case _ => throw new IllegalArgumentException(fn)
    }
    val partial = df
      .withColumn("__salt", pmod(hash(saltBy), lit(salts)))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(aggs.head match { case (fn, c) => partialExpr(fn, c).as(s"__p_$fn$c") },
        aggs.tail.map { case (fn, c) => partialExpr(fn, c).as(s"__p_$fn$c") }: _*)
    partial
      .groupBy(keys.map(col): _*)
      .agg(aggs.head match { case (fn, c) => mergeExpr(fn, c).as(s"${fn}_$c") },
        aggs.tail.map { case (fn, c) => mergeExpr(fn, c).as(s"${fn}_$c") }: _*)
  }

  /** Salted equi-join for a skewed fact side. A shuffle join hashes on the
    * join keys alone, so a hot key's entire fact row set lands in one task
    * — AQE's skew-join split repairs that for sort-merge joins it can see,
    * but not for plans where the skewed exchange is reused downstream or
    * the join is produced by an operator AQE won't split. The explicit
    * form: the fact side gets a deterministic salt in [0, salts) hashed
    * from `saltBy` (any column spreading rows WITHIN a key — never affects
    * the result), the other side replicates each row `salts` times, and
    * the join runs on (keys, salt) so a hot key spreads over `salts` tasks.
    *
    * Row-for-row identical to `fact.join(other, keys, joinType)`: every
    * fact row matches exactly the one replica of each matching `other` row
    * that carries its salt ("inner"), and an unmatched fact row survives a
    * "left" join unchanged (its salted key matches no replica at all).
    * Cost: `other` is scanned once but shuffled ×salts — the knob trades
    * replication for per-task balance, so keep `salts` small (8-32) and
    * the replicated side the narrow one. Only fact-side keys may be
    * skewed; "right"/"full" would need the mirror construction.
    */
  def saltedJoin(
      fact: DataFrame,
      other: DataFrame,
      keys: Seq[String],
      saltBy: Column,
      salts: Int,
      joinType: String = "inner"): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    require(Set("inner", "left", "left_outer", "leftouter")(joinType),
      s"saltedJoin spreads fact-side (left) skew; joinType must be inner " +
        s"or left, got '$joinType'")
    val f = fact.withColumn("__salt", pmod(hash(saltBy), lit(salts)))
    val o = other.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    f.join(o, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Exact top-k per key WITHOUT a per-key global sort — the scale-safe
    * form of `row_number().over(Window.partitionBy(key).orderBy(...))
    * <= k` when the key has small, fixed cardinality (event types,
    * languages, sources): the window form sorts each key's FULL row set
    * on one task. Two phases:
    *  1. rows spread across `salts` sub-partitions of their key (the
    *     [[saltedAgg]] spread) and each (key, salt) keeps its LOCAL
    *     top-k — any row outside a local top-k is outside the global one
    *     (k survivors per sub-partition is a superset of each one's
    *     contribution);
    *  2. the global top-k window runs over the ≤ k·salts survivors per
    *     key — bounded however large the key's row set.
    * Output is byte-identical to the single-window form for any `salts`
    * (the final rank rides the same total order).
    *
    * @param order  full ORDER BY spec, must be a total order (include an
    *               id tiebreak) so ranks are deterministic
    * @param saltBy high-cardinality column(s) inside hot keys (an id)
    */
  def topKPerKey(df: DataFrame, keyCol: String, order: Seq[Column],
      saltBy: Column, k: Int, outRankCol: String = "rn",
      salts: Int = 64): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(salts > 0, s"salts must be positive, got $salts")
    val wLocal = Window
      .partitionBy(col(keyCol), pmod(hash(saltBy), lit(salts)))
      .orderBy(order: _*)
    val wGlobal = Window.partitionBy(col(keyCol)).orderBy(order: _*)
    df.withColumn("__lrn", row_number().over(wLocal))
      .filter(col("__lrn") <= k)
      .withColumn(outRankCol, row_number().over(wGlobal))
      .filter(col(outRankCol) <= k)
      .drop("__lrn")
  }

  /** Exact interpolated percentiles per key WITHOUT buffering a key's
    * full value set — the scale-safe form of `percentile(value, p)` over
    * a small fixed-cardinality key, where Spark's exact aggregate holds
    * every (value, count) of a key in ONE task's hash map. The
    * distributed-selection shape:
    *  1. values land in coarse order-aligned buckets; per-(key, bucket)
    *     counts are a TINY frame whose cumulative offsets + per-key
    *     totals localize every order statistic: each requested p needs
    *     only the values at 0-based ranks floor(p·(n−1)) and
    *     ceil(p·(n−1)), and the count frame names WHICH bucket holds
    *     each rank and the rank local to it;
    *  2. only rows in those needed buckets survive a broadcast semi-cut
    *     (a handful of buckets per key — the corpus is scanned, never
    *     sorted), get a bucket-local rank on bounded partitions, and the
    *     matching rows interpolate with Spark's `Percentile` arithmetic
    *     term for term ((hi−pos)·x_lo + (pos−lo)·x_hi, lower value
    *     verbatim when the position is integral) — bit-identical
    *     doubles.
    * Two column-pruned corpus scans, no corpus-wide sort or rank, no
    * driver-side value buffering. Degenerate case, stated honestly: a
    * key whose values concentrate in ONE coarse bucket ranks that whole
    * key in one partition again — coarseScale is the dial, the count
    * frame the audit surface (the [[Sampling.ntileDescBucketed]] note).
    *
    * @return one row per (key, percentage): (keyCol, p, pct)
    */
  def percentileExactByKey(df: DataFrame, keyCol: String, valueCol: String,
      ps: Seq[Double], coarseScale: Double = 16.0): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      s"percentages must be within [0, 1], got $ps")
    require(coarseScale > 0, s"coarseScale must be > 0, got $coarseScale")
    // Spark's percentile aggregate IGNORES null values — drop them before
    // counting or every position would shift (parity spec pins this).
    // NaN values sort GREATER than every real double in Spark's ordering
    // (the ordering Percentile ranks by) — the routing policy lives in
    // the shared BucketedOffsets core (r11 verdict #3), here ASC so NaN
    // takes the max-long bucket after every real bucket
    val withKey = df.select(col(keyCol), col(valueCol))
      .filter(col(valueCol).isNotNull)
      .withColumn("__cb", BucketedOffsets.coarseBucket(col(valueCol),
        coarseScale, desc = false, nullBucket = None))
    // tiny, materialized once; feeds needs + targets (the offsets frame
    // is joined query-sized-to-tiny, never broadcast corpus-wide, so no
    // guard count job — structurally bucket-bounded like tokenBudget's)
    val offsets = BucketedOffsets.frame(withKey,
      keyCol = col(keyCol), bucketCol = col("__cb"),
      cAgg = count(lit(1)),
      extras = Seq(min(col(valueCol)).as("__mnv"),
        (min(col(valueCol)) <=> max(col(valueCol))).as("__tied")),
      withTotal = true, materialize = true, maxRows = -1L,
      op = "percentileExactByKey", hint = "")
    // the ranks each percentage needs, per key (keys × ps × 2 rows)
    val needs = offsets.select(col("__okey"), col("__n")).distinct()
      .select(col("__okey"), col("__n"), explode(array(ps.map(lit): _*)).as("p"))
      .withColumn("__pos", col("p") * (col("__n") - 1).cast("double"))
      .withColumn("__lo", floor(col("__pos")).cast("long"))
      .withColumn("__hi", ceil(col("__pos")).cast("long"))
    // locate each needed rank: the bucket whose [off, off+c) span holds it,
    // plus the rank local to that bucket — all arithmetic on tiny frames
    val targets = needs
      .select(col("__okey").as("__tkey"), col("p"), col("__pos"),
        col("__lo"), col("__hi"), explode(array(
          struct(col("__lo").as("r"), lit("lo").as("which")),
          struct(col("__hi").as("r"), lit("hi").as("which")))).as("nr"))
      .select(col("__tkey"), col("p"), col("__pos"), col("__lo"),
        col("__hi"), col("nr.r").as("__r"), col("nr.which").as("__which"))
      .join(offsets, col("__tkey") === col("__okey") &&
        col("__r") >= col("__off") && col("__r") < col("__off") + col("__c"))
      .select(col("__tkey"), col("__ocb").as("__tcb"), col("p"),
        col("__pos"), col("__lo"), col("__hi"), col("__which"),
        (col("__r") - col("__off")).as("__lr"),
        col("__mnv"), col("__tied"))
    // tied-bucket shortcut (r10 verdict watch — the degenerate-spread
    // case): a bucket whose values are ALL EQUAL (min <=> max; an all-NaN
    // bucket qualifies, Spark NaN = NaN) holds the same value at EVERY
    // local rank, so a target landing in it resolves directly from the
    // count frame — the corpus rows of fully-tied buckets are never
    // scanned, never ranked. A key whose values concentrate in one bucket
    // with DISTINCT values still ranks that bucket in one partition —
    // there coarseScale is the dial and the count frame the audit surface.
    val tiedPicks = targets.filter(col("__tied"))
      .select(col("__tkey").as(keyCol), col("p"), col("__pos"),
        col("__lo"), col("__hi"), col("__which"), col("__mnv").as(valueCol))
    val untied = targets.filter(!col("__tied"))
    // only the needed buckets' rows survive (broadcast cut, map-side) and
    // get a bucket-local rank on bounded partitions
    val cut = untied.select(col("__tkey").as("__ckey"),
      col("__tcb").as("__ccb")).distinct()
    val wLocal = Window.partitionBy(col(keyCol), col("__cb"))
      .orderBy(col(valueCol))
    val picked = withKey
      .join(broadcast(cut),
        col(keyCol) <=> col("__ckey") && col("__cb") <=> col("__ccb"))
      .withColumn("__lrn0",
        row_number().over(wLocal).cast("long") - 1)
      .join(broadcast(untied), col(keyCol) <=> col("__tkey") &&
        col("__cb") === col("__tcb") && col("__lrn0") === col("__lr"))
      .select(col(keyCol), col("p"), col("__pos"), col("__lo"),
        col("__hi"), col("__which"), col(valueCol))
    picked.unionByName(tiedPicks)
      .groupBy(col(keyCol), col("p"))
      .agg(
        max(when(col("__which") === "lo", col(valueCol))).as("__xlo"),
        max(when(col("__which") === "hi", col(valueCol))).as("__xhi"),
        first(col("__pos")).as("__pos"),
        first(col("__lo")).as("__flo"),
        first(col("__hi")).as("__fhi"))
      // Spark Percentile.getPercentile verbatim: integral position
      // returns the lower value; otherwise (hi−pos)·x_lo + (pos−lo)·x_hi
      .withColumn("pct", when(col("__flo") === col("__fhi"), col("__xlo"))
        .otherwise(
          (col("__fhi").cast("double") - col("__pos")) * col("__xlo") +
            (col("__pos") - col("__flo").cast("double")) * col("__xhi")))
      .select(col(keyCol), col("p"), col("pct"))
  }
}
