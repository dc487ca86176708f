package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sessionization (gaps-and-islands) over an event stream — the batch form
  * of the user-activity session analysis every events pipeline needs
  * (streaming twin: `session_window` aggregation, StreamingSpec).
  *
  * Scale contract: ONE shuffle on the session key; the lag window, the
  * running-sum window and the final per-session aggregate all share that
  * partitioning, so Catalyst plans a single Exchange followed by
  * sort-based windows — no second shuffle. At 100 TB the key (user) is the
  * natural partitioning and per-user event counts are bounded, so no
  * straggler risk beyond ordinary key skew (salt upstream if one user is
  * a bot firehose).
  */
object Sessions {

  /** Label every event with its session: a new session starts when the gap
    * to the previous event of the same key exceeds `gapSeconds`. Ordering
    * ties on `tsCol` are broken by `tieCol` so results are deterministic
    * and engine-reproducible. Gap comparison uses whole-second timestamps
    * (unix_timestamp), matching SQL `date_diff('second', ...)`.
    */
  def sessionize(events: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    events
      .withColumn("__prev_ts", lag(col(tsCol), 1).over(w))
      .withColumn("__new_session",
        when(col("__prev_ts").isNull ||
          unix_timestamp(col(tsCol)) - unix_timestamp(col("__prev_ts")) > gapSeconds,
          1L).otherwise(0L))
      .withColumn("session_seq",
        sum(col("__new_session"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__prev_ts", "__new_session")
  }

  /** One row per session: event count, bounds, duration in whole seconds. */
  def sessionStats(events: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, gapSeconds: Long): DataFrame =
    sessionize(events, keyCol, tsCol, tieCol, gapSeconds)
      .groupBy(col(keyCol), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"))
      .withColumn("duration_seconds",
        unix_timestamp(col("session_end")) - unix_timestamp(col("session_start")))
}
