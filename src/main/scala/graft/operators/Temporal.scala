package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series joins Spark has no native operator for. */
object Temporal {

  /** As-of join: for every left row, the single right row with the
    * greatest timestamp ≤ the left timestamp within the same key (the
    * "latest quote for this trade" lookup). Spark has no ASOF operator;
    * the naive form — an inequality join + per-left-row argmax — expands
    * every left row against its key's whole right history before
    * collapsing, quadratic per key. This is the UNION-AND-WINDOW form
    * instead: tag both sides, union them, and carry the last right row
    * forward over a (key)-partitioned (ts, side)-ordered window
    * (`last_value(..., ignoreNulls)` over rows-unbounded-preceding). ONE
    * hash exchange on the key, O(left + right) rows total, no join
    * operator, no expansion — each right row is visited once however
    * many left rows it serves. Ties (left.ts == right.ts) take the right
    * row (side ordering puts right first at equal ts — the inclusive
    * `≤` every ASOF implementation defaults to).
    *
    * Returns the left rows (caller columns) plus `rightValCol` (the
    * as-of right value, null when no right row precedes) and
    * `right_ts` (its timestamp).
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: String, rightTs: String, rightValCol: String): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left.select(
      col(keyCol).as("__k"), col(leftTs).as("__ts"), lit(1).as("__side"),
      lit(null).cast(right.schema(rightValCol).dataType).as("__rv"),
      lit(null).cast(right.schema(rightTs).dataType).as("__rts"),
      struct(leftCols.map(col): _*).as("__row"))
    // a right row with a null key or null ts can never match ANY left row
    // under join semantics (null comparisons are never true) — but in the
    // union-window form a null-ts row would sort FIRST and its value would
    // be carried into every left row of the partition, and null-key rows
    // would pair with null-key left rows. Drop them up front; left rows
    // with null key/ts then correctly see no carried value at all.
    val r = right
      .filter(col(keyCol).isNotNull && col(rightTs).isNotNull)
      .select(
        col(keyCol).as("__k"), col(rightTs).as("__ts"), lit(0).as("__side"),
        col(rightValCol).as("__rv"), col(rightTs).as("__rts"),
        lit(null).cast(l.schema("__row").dataType).as("__row"))
    // __rv in the ordering is determinism belt for a right side that
    // still carries duplicate (key, ts) rows: the max value wins
    val w = Window.partitionBy("__k")
      .orderBy(col("__ts").asc, col("__side").asc, col("__rv").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .withColumn("__asof_v", last(col("__rv"), ignoreNulls = true).over(w))
      .withColumn("__asof_ts", last(col("__rts"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    carried.select(
      leftCols.map(c => col(s"__row.$c").as(c)) ++
        Seq(col("__asof_v").as(rightValCol), col("__asof_ts").as("right_ts")): _*)
  }

  /** Interval-overlap self-join: all pairs of intervals (id, start, end]
    * that overlap (a.start ≤ b.end AND b.start ≤ a.end), id_a < id_b.
    * The naive form is an inequality cross join — quadratic in rows; this
    * is the BUCKETED form: every interval explodes into the fixed-width
    * time buckets it covers (epoch-seconds / `bucketSeconds`), candidates
    * join on the bucket id, and the exact overlap predicate then dedup
    * discard false candidates and bucket-duplicates — the LSH-banding
    * economics applied to time (candidates are per-bucket co-occupants,
    * never all pairs). `bucketSeconds` trades expansion rows (long
    * intervals cover many buckets) against bucket population; size it
    * near the median interval length. Timestamps are compared as epoch
    * seconds — exact integers in both engines.
    */
  def intervalOverlapPairs(intervals: DataFrame, idCol: String,
      startCol: String, endCol: String, bucketSeconds: Long): DataFrame = {
    require(bucketSeconds >= 1, s"bucketSeconds must be >= 1, got $bucketSeconds")
    val base = intervals.select(col(idCol).as("__id"),
      unix_timestamp(col(startCol)).as("__s"),
      unix_timestamp(col(endCol)).as("__e"))
    val bucketed = base.select(col("__id"), col("__s"), col("__e"),
      explode(sequence(floor(col("__s") / bucketSeconds),
        floor(col("__e") / bucketSeconds))).as("__b"))
    val a = bucketed
    val b = bucketed.select(col("__id").as("__id2"), col("__s").as("__s2"),
      col("__e").as("__e2"), col("__b"))
    a.join(b, Seq("__b"))
      .filter(col("__id") < col("__id2")
        && col("__s") <= col("__e2") && col("__s2") <= col("__e"))
      .select(col("__id").as("id_a"), col("__id2").as("id_b"))
      .distinct()
  }
}
