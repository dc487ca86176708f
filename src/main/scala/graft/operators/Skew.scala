package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
}
