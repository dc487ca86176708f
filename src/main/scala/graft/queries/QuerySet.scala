package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** A named bundle of driver-checkable queries.
  *
  * Each entry in `queries` is a function (spark, sfDir) => DataFrame over the
  * driver's parquet fixtures; `oracles` holds the equivalent DuckDB SQL for
  * hash-comparison. Queries with no SQL-expressible oracle are simply absent
  * from `oracles` (the driver then records a rows-only check).
  */
trait QuerySet {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]
}

/** Shared helpers keeping Spark results bit-identical to the DuckDB oracle. */
object Q {
  def t(s: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts has shipped as both parquet TIMESTAMP(NANOS) (which Spark 4
    // only reads as a long) and TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ)
    // across fixture generations; normalize either to a session-TZ (UTC)
    // micros timestamp so every consumer sees one type. The DIV 1000 on the
    // long form is integer division = DuckDB's own ns→us truncation, so both
    // engines see identical values.
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // normTs's NTZ→timestamp cast is wall-clock-preserving ONLY under a UTC
    // session TZ; every entry point pins it already, but pin it here too so
    // a caller with an unpinned session cannot get silently shifted
    // timestamps vs the DuckDB oracle (ADVICE r6)
    s.conf.set("spark.sql.session.timeZone", "UTC")
    val df = s.read.parquet(s"$dir/$name.parquet")
    if (name == "events") df.withColumn("ts", normTs(df, "ts")) else df
  }

  /** ts column normalized to TimestampType regardless of the fixture's
    * physical parquet type (long nanos | TIMESTAMP_NTZ micros | TIMESTAMP).
    * The session TZ is pinned to UTC, so the NTZ→TZ cast preserves the wall
    * clock DuckDB reads from the same file.
    */
  def normTs(df: DataFrame, c: String): Column = df.schema(c).dataType match {
    case org.apache.spark.sql.types.LongType =>
      // a raw-long ts is assumed parquet TIMESTAMP(NANOS); fail loud if the
      // values are only plausible as micros/millis (a future fixture
      // generation changing units) instead of silently dividing by 1000
      // (ADVICE r6). 1e17 ns ≈ 1973-03; micros/millis for any modern date
      // fall far below it. assert_true returns NULL when the guard holds.
      val guard = assert_true(col(c).isNull || col(c) >= lit(100000000000000000L),
        lit(s"$c: long timestamp too small to be nanoseconds — " +
          "fixture shipped micros/millis?"))
      timestamp_micros(when(guard.isNull, expr(s"$c DIV 1000")))
    case org.apache.spark.sql.types.TimestampNTZType => col(c).cast("timestamp")
    case _ => col(c)
  }

  /** Order-independent money sum: cast to decimal (exact, associative), sum,
    * cast back to double. Double summation order differs between engines
    * (and between Spark partitions); decimal does not.
    */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast("double")

  /** Sum of a derived value with more fractional digits (e.g. price*(1-disc)). */
  def dsum4(c: Column): Column = sum(c.cast(DecimalType(22, 4))).cast("double")

  /** Deterministic average built on the decimal sum.
    *
    * Rounding caveat (learned at sf0.1): `round(x, n)` can DIVERGE between
    * engines even on bit-identical x when x sits exactly on a rounding tie
    * (Spark rounds the shortest-decimal repr half-up, DuckDB rounds the
    * binary double — e.g. 1512.12/32 = 47.25375 → 47.2538 vs 47.2537).
    * Prefer UNROUNDED division when both operands are already
    * deterministic; keep round() only where it cannot tie (and mirror it
    * in the oracle SQL).
    */
  def davg(c: Column): Column =
    round(sum(c.cast(DecimalType(18, 2))).cast("double") / count(c), 6)
}
