package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The shared two-pass bucketed-prefix core (r11 verdict #3): the
  * distributed-selection machinery [[Sampling.tokenBudget]],
  * [[Sampling.ntileDescBucketed]] (both rank levels), and
  * [[Skew.percentileExactByKey]] all run on — previously three (four)
  * hand-maintained copies whose NaN/null/tie fixes had to land
  * separately in Sampling AND Skew.
  *
  * The idiom: a corpus-wide per-key prefix sum (running rank, running
  * token total, order statistic localization) is never computed with a
  * single per-key window — that sorts each key's FULL row set on one
  * task, terabytes per head key at 100 TB. Instead
  *  1. rows land in coarse ORDER-ALIGNED buckets ([[coarseBucket]] —
  *     monotone in the target ordering, with the NaN/null routing
  *     policy centralized here);
  *  2. per-(key, bucket) aggregates form a TINY frame; cumulative
  *     offsets and per-key totals come from windows over THAT frame
  *     ([[frame]]) and broadcast back;
  *  3. each row's global prefix value = its bucket's offset + a value
  *     local to the (key, bucket) partition — bounded tasks however
  *     skewed the keys.
  * Callers differ only in the per-bucket aggregate (counts vs token
  * sums), the extra per-bucket facts they carry (tie flags, bucket
  * minima), and whether the frame is materialized/bounded — hence the
  * knobs; everything ordering-sensitive lives here once.
  */
private[operators] object BucketedOffsets {

  /** Coarse order-aligned bucket over a numeric order column — the ONE
    * place the NaN/null routing policy lives (r10 advice, previously
    * duplicated: `floor(NaN·scale)` casts to 0 and interleaves NaN with
    * real values, and a null order key must reproduce the window form's
    * NULLS-LAST default).
    *
    * Spark's double ordering puts NaN GREATER than every real: under a
    * DESC target order NaN rows come FIRST (the dedicated min-long
    * bucket), under ASC last (max-long). `floor(±order·scale)` is
    * monotone in the target order for everything real, so bucket order
    * equals sort order and ties share a bucket.
    *
    * @param nullBucket where null order values route (the window form's
    *                   NULLS-LAST default for DESC is `Long.MaxValue`);
    *                   None when the caller pre-filters nulls
    */
  def coarseBucket(order: Column, coarseScale: Double, desc: Boolean,
      nullBucket: Option[Long]): Column = {
    val real = (if (desc) floor(-order * coarseScale)
      else floor(order * coarseScale)).cast("long")
    val nanBucket = lit(if (desc) Long.MinValue else Long.MaxValue)
    val withNan = when(isnan(order.cast("double")), nanBucket)
      .otherwise(real)
    nullBucket match {
      case Some(b) => when(order.isNull, lit(b)).otherwise(withNan)
      case None => withNan
    }
  }

  /** The per-(key, bucket) offsets frame: group, aggregate, and attach
    * the exclusive cumulative prefix `__off` (window over THIS tiny
    * frame, never the corpus) plus optionally the per-key total `__n`.
    * Output columns: `__okey` (the key), `__ocb` (the bucket), `__c`
    * (the primary aggregate), the `extras` under their own aliases,
    * `__off`, and `__n` when requested.
    *
    * `materialize` localCheckpoints the frame so its multiple consumers
    * (the guard count, the broadcast join, a needs/targets derivation)
    * ride one computation instead of re-aggregating the corpus.
    * `maxRows >= 0` fail-loud bounds the frame BEFORE it is broadcast /
    * globally windowed — the r10-advice guard, also centralized here
    * (`hint` names the caller's remedy knob). Callers whose frame is
    * structurally bounded by construction (tokenBudget's 16^bucketChars)
    * pass a NEGATIVE value and skip the extra count job entirely.
    */
  def frame(withKey: DataFrame, keyCol: Column, bucketCol: Column,
      cAgg: Column, extras: Seq[Column], withTotal: Boolean,
      materialize: Boolean, maxRows: Long, op: String,
      hint: String): DataFrame = {
    val wOffset = Window.partitionBy("__okey").orderBy("__ocb")
      .rowsBetween(Window.unboundedPreceding, -1)
    val base = withKey
      .groupBy(keyCol.as("__okey"), bucketCol.as("__ocb"))
      .agg(cAgg.as("__c"), extras: _*)
      .withColumn("__off", coalesce(sum(col("__c")).over(wOffset), lit(0L)))
    val tot = if (withTotal)
      base.withColumn("__n",
        sum(col("__c")).over(Window.partitionBy("__okey")))
    else base
    val out = if (materialize) tot.localCheckpoint(false) else tot
    if (maxRows >= 0) {
      require(out.count() <= maxRows,
        s"$op: per-(key, bucket) count frame exceeds $maxRows rows — " +
          s"it is broadcast to every executor; $hint")
    }
    out
  }
}
