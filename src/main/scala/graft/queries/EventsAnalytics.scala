package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Monitoring / dashboard analytics from SURVEY.md §2.5 (A10-A18), §2.6
  * (W1-W4), §2.7 (O1-O5) and scalar families §2.9 (X10-X21), expressed over
  * the `events` stream table.
  *
  * Scale notes: every windowed aggregate here groups on a time bucket (a
  * plain derived column), so it hash-partitions across the cluster — no
  * global sort. Top-k uses TakeOrderedAndProject (per-partition heap + merge
  * on the driver), never a full sort. Latest-per-key is a window function
  * shuffled once by key.
  */
object EventsAnalytics extends QuerySet {

  /** W1/A11 (ref: monitoring/sftp-monitoring-queries.md:34 arg_max) —
    * latest row per key via row_number over (key, ts desc).
    */
  def q10(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    Q.t(s, dir, "events")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("user_id", "event_id", "ts", "event_type", "value")
  }

  /** A10/W2 (ref: monitoring/sftp-monitoring-queries.md:16-23) — hourly
    * bins with countif → success-rate percentage.
    */
  def q11(s: SparkSession, dir: String): DataFrame =
    Q.t(s, dir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("hour"))
      .agg(
        count(lit(1)).as("cnt"),
        sum(when(col("event_type") === "error", 1).otherwise(0)).cast("long")
          .as("n_errors"))
      .withColumn("success_rate",
        round((col("cnt") - col("n_errors")).cast("double") / col("cnt") * 100, 4))

  /** W3 (ref: portal-backend-spec.md:243,251 top-N per window) — top-3 rows
    * per event_type by value, deterministic tiebreak. event_type is a
    * BOUNDED-cardinality key, so the plain
    * `row_number().over(partitionBy(event_type))` form sorts each type's
    * full event set on one task at corpus scale (the td56 class, r10
    * audit); `Skew.topKPerKey` keeps the identical top-3 through a salted
    * local pre-cut (≤ k·salts survivors per type reach the rank window).
    */
  def q12(s: SparkSession, dir: String): DataFrame =
    graft.operators.Skew.topKPerKey(Q.t(s, dir, "events"), "event_type",
        order = Seq(col("value").desc, col("event_id").asc),
        saltBy = col("event_id"), k = 3)
      .select("event_type", "rn", "event_id", "user_id", "value")

  /** A17 (ref: portal-backend-spec.md:208 {avgMs,p95Ms,maxMs,count}) —
    * exact interpolated percentiles per group. Same bounded-key hazard as
    * q12 but for Spark's exact `percentile` AGGREGATE, whose merge buffer
    * holds every (value, count) of a type in one task's hash map at
    * corpus scale; `Skew.percentileExactByKey` computes the identical
    * interpolated values (Spark's Percentile arithmetic term for term)
    * from bucketed exact ranks — bit-identical doubles, hash unchanged.
    * The algebraic aggregates (count/max/decimal avg) keep their plain
    * partial-aggregating groupBy (tiny state — never the hazard); the two
    * type-keyed result frames join broadcast. Measured trade (r10): the
    * selection form pays ~3 stage floors over the one-aggregate original
    * at the fixture tiers (sf0.1 0.37 → 1.20 s, f10 1.70 s, f30 2.36 s —
    * sublinear growth), the price of never holding a type's value set on
    * one task; the q60/tokenBudget floor-vs-shape precedent.
    */
  def q13(s: SparkSession, dir: String): DataFrame = {
    val ev = Q.t(s, dir, "events")
    val pcts = graft.operators.Skew
      .percentileExactByKey(ev, "event_type", "value", Seq(0.5, 0.95))
      .groupBy("event_type")
      .agg(
        round(max(when(col("p") === 0.5, col("pct"))), 4).as("p50"),
        round(max(when(col("p") === 0.95, col("pct"))), 4).as("p95"))
    ev.groupBy("event_type")
      .agg(
        count(lit(1)).as("cnt"),
        max(col("value")).as("max_value"),
        Q.davg(col("value")).as("avg_value"))
      // LEFT join (r10 advice): percentileExactByKey drops null values, so
      // an event_type whose values are ALL NULL has no percentile rows at
      // all — the group must still appear with cnt/max/avg populated and
      // NULL p50/p95, exactly as Spark's percentile aggregate (NULL over
      // an empty value set) and DuckDB's quantile_cont behave
      .join(broadcast(pcts), Seq("event_type"), "left")
      .select(col("event_type"), col("cnt"), col("p50"), col("p95"),
        col("max_value"), col("avg_value"))
  }

  /** A15 (ref: monitoring/sftp-monitoring-queries.md:183-198 throughput by
    * bin+partner) — two-key time rollup with MB-style rounding.
    */
  def q14(s: SparkSession, dir: String): DataFrame =
    Q.t(s, dir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(
        Q.dsum(col("value")).as("sum_value"),
        count(lit(1)).as("cnt"))
      // unrounded: both operands are bit-identical across engines (decimal
      // sum, exact count), so the IEEE division is too; rounding would
      // DIVERGE on ties (e.g. 1512.12/32 = 47.25375 — Spark rounds the
      // shortest-decimal repr half-up, DuckDB rounds the binary double)
      .withColumn("avg_value", col("sum_value") / col("cnt"))

  /** A16/W4 (ref: monitoring/sftp-monitoring-queries.md:152-159) — failure
    * bursts: 15-min buckets (epoch arithmetic, timezone-free) having
    * error-count above threshold.
    */
  def q15(s: SparkSession, dir: String): DataFrame =
    Q.t(s, dir, "events")
      .filter(col("event_type") === "error")
      .groupBy((floor(unix_timestamp(col("ts")) / 900)).cast("long").as("bucket_15m"))
      .agg(count(lit(1)).as("n_errors"))
      .filter(col("n_errors") > 3)

  /** A13 (ref: monitoring KQL `evaluate pivot`) — day × event_type count
    * matrix as fixed conditional sums (plan-time schema, single shuffle).
    */
  def q16(s: SparkSession, dir: String): DataFrame = {
    def cnt(t: String) =
      sum(when(col("event_type") === t, 1).otherwise(0)).cast("long")
    Q.t(s, dir, "events")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(
        count(lit(1)).as("cnt"),
        cnt("click").as("n_click"),
        cnt("error").as("n_error"),
        cnt("purchase").as("n_purchase"),
        cnt("signup").as("n_signup"),
        cnt("view").as("n_view"))
  }

  /** A14 (ref: make_set + array_length) — distinct-set per group, sorted
    * for cross-engine determinism. The set is emitted ","-joined: the
    * driver's pandas canonicalizer cannot sort raw array columns
    * (TypeError: unhashable ndarray), and a flat string compares identically.
    */
  def q17(s: SparkSession, dir: String): DataFrame =
    Q.t(s, dir, "events")
      .filter(col("value") > 190)
      .groupBy("event_type")
      .agg(
        concat_ws(",", sort_array(collect_set(col("user_id")))).as("users"),
        countDistinct(col("user_id")).as("n_users"))

  /** O4 (ref: portal-backend-spec.md:251 top-N large files) — global top-k
    * with full deterministic ordering → TakeOrderedAndProject, no full sort.
    */
  def q18(s: SparkSession, dir: String): DataFrame =
    Q.t(s, dir, "events")
      .orderBy(col("value").desc, col("event_id").asc)
      .limit(20)
      .select("event_id", "user_id", "event_type", "value")

  /** X17-X19 (ref: date_format/strftime/EXTRACT EPOCH usages) — date/time
    * scalar family.
    */
  def q21(s: SparkSession, dir: String): DataFrame =
    Q.t(s, dir, "orders")
      .filter(col("o_orderkey") % 100 === 0)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mon"),
        dayofmonth(col("o_orderdate")).as("dom"),
        date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
        datediff(lit("2002-01-01").cast("date"), to_date(col("o_orderdate")))
          .as("days_to_2002"),
        unix_timestamp(col("o_orderdate")).as("epoch_s"))

  /** X20 (ref: json.loads in gold UDFs; JSONB in init.sql) — JSON field
    * extraction + typed cast + rollup.
    */
  def q22(s: SparkSession, dir: String): DataFrame =
    Q.t(s, dir, "events")
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy("k")
      .agg(
        count(lit(1)).as("cnt"),
        Q.dsum(col("value")).as("sum_value"))

  /** X16 (ref: gold_x12_analytics.py:492-494 ratio-with-guard) — per-user
    * purchase/error ratio, divide-by-zero guarded.
    */
  def q23(s: SparkSession, dir: String): DataFrame =
    Q.t(s, dir, "events")
      .groupBy("user_id")
      .agg(
        sum(when(col("event_type") === "purchase", 1).otherwise(0)).cast("long")
          .as("n_purchase"),
        sum(when(col("event_type") === "error", 1).otherwise(0)).cast("long")
          .as("n_error"))
      .withColumn("purchase_error_ratio",
        when(col("n_error") > 0,
          round(col("n_purchase").cast("double") / col("n_error"), 4))
          .otherwise(lit(0.0)))

  /** X12 (ref: silver float coercion w/ 0.0 default) — null-safe cast with
    * default; malformed numerics yield the default, not an error (Spark 4
    * ANSI mode makes plain cast throw, so try_cast is the right primitive).
    */
  def q24(s: SparkSession, dir: String): DataFrame =
    Q.t(s, dir, "events")
      .filter(col("event_id") < 1000)
      .select(
        col("event_id"),
        coalesce(try_cast(get_json_object(col("props"), "$.k"), "double"),
          lit(0.0)).as("k_val"),
        coalesce(try_cast(col("event_type"), "double"), lit(0.0)).as("bad_cast"))

  private def try_cast(c: org.apache.spark.sql.Column, to: String) =
    c.try_cast(to)

  /** VariantType path (q57): the Spark 4 semi-structured column type —
    * `parse_json` once into a binary variant, then typed `variant_get`
    * extraction, vs q22's per-access string re-parse
    * (`get_json_object`). At 100 TB the difference is material: a
    * variant column parses each JSON document ONCE at ingest and every
    * downstream extraction is a binary offset walk, while the string
    * form re-tokenizes the document per extraction per query. The
    * rollup result is identical to the string path by construction —
    * which is exactly what the oracle hash pins.
    */
  def q57(s: SparkSession, dir: String): DataFrame =
    Q.t(s, dir, "events")
      .withColumn("v", parse_json(col("props")))
      .withColumn("k", variant_get(col("v"), "$.k", "int"))
      .groupBy((col("k") % 10).as("k_bucket"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("k")).cast("long").as("sum_k"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q10_latest_per_key" -> (q10 _),
    "q11_hourly_rollup" -> (q11 _),
    "q12_topn_per_group" -> (q12 _),
    "q13_percentiles" -> (q13 _),
    "q14_throughput" -> (q14 _),
    "q15_alert_windows" -> (q15 _),
    "q16_pivot_matrix" -> (q16 _),
    "q17_distinct_sets" -> (q17 _),
    "q18_topk_global" -> (q18 _),
    "q21_date_functions" -> (q21 _),
    "q22_json_extract" -> (q22 _),
    "q23_ratio_guard" -> (q23 _),
    "q24_nullsafe_cast" -> (q24 _),
    "q57_variant_extract" -> (q57 _))

  val oracles: Map[String, String] = Map(
    "q57_variant_extract" ->
      """SELECT CAST(json_extract(props, '$.k') AS INTEGER) % 10 AS k_bucket,
        | count(*) AS cnt,
        | CAST(SUM(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT)
        |   AS sum_k
        |FROM events GROUP BY 1""".stripMargin,
    "q10_latest_per_key" ->
      """SELECT user_id, event_id, ts, event_type, value FROM (
        | SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        | FROM events) WHERE rn = 1""".stripMargin,
    "q11_hourly_rollup" ->
      """SELECT date_trunc('hour', ts) AS hour, count(*) AS cnt,
        | CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors,
        | round(CAST(count(*) - SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS DOUBLE) / count(*) * 100, 4) AS success_rate
        |FROM events GROUP BY 1""".stripMargin,
    "q12_topn_per_group" ->
      """SELECT event_type, CAST(rn AS INTEGER) AS rn, event_id, user_id, value FROM (
        | SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id ASC) AS rn
        | FROM events) WHERE rn <= 3""".stripMargin,
    "q13_percentiles" ->
      """SELECT event_type, count(*) AS cnt,
        | round(quantile_cont(value, 0.5), 4) AS p50,
        | round(quantile_cont(value, 0.95), 4) AS p95,
        | max(value) AS max_value,
        | round(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(value), 6) AS avg_value
        |FROM events GROUP BY event_type""".stripMargin,
    "q14_throughput" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        | count(*) AS cnt,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q15_alert_windows" ->
      """SELECT CAST(floor(epoch(ts)/900) AS BIGINT) AS bucket_15m,
        | count(*) AS n_errors
        |FROM events WHERE event_type = 'error'
        |GROUP BY 1 HAVING count(*) > 3""".stripMargin,
    "q16_pivot_matrix" ->
      """SELECT CAST(ts AS DATE) AS day, count(*) AS cnt,
        | CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
        | CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
        | CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
        | CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
        | CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view
        |FROM events GROUP BY 1""".stripMargin,
    "q17_distinct_sets" ->
      """SELECT event_type,
        | array_to_string(list_sort(list(DISTINCT user_id)), ',') AS users,
        | count(DISTINCT user_id) AS n_users
        |FROM events WHERE value > 190 GROUP BY event_type""".stripMargin,
    "q18_topk_global" ->
      """SELECT event_id, user_id, event_type, value FROM events
        |ORDER BY value DESC, event_id ASC LIMIT 20""".stripMargin,
    "q21_date_functions" ->
      """SELECT o_orderkey,
        | CAST(year(o_orderdate) AS INTEGER) AS yr,
        | CAST(month(o_orderdate) AS INTEGER) AS mon,
        | CAST(day(o_orderdate) AS INTEGER) AS dom,
        | strftime(o_orderdate, '%Y-%m') AS ym,
        | CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INTEGER) AS days_to_2002,
        | CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
        |FROM orders WHERE o_orderkey % 100 = 0""".stripMargin,
    "q22_json_extract" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
        | count(*) AS cnt,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1""".stripMargin,
    "q23_ratio_guard" ->
      """SELECT user_id,
        | CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
        | CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
        | CASE WHEN SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) > 0
        |   THEN round(CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS DOUBLE)
        |              / SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END), 4)
        |   ELSE 0.0 END AS purchase_error_ratio
        |FROM events GROUP BY user_id""".stripMargin,
    "q24_nullsafe_cast" ->
      """SELECT event_id,
        | COALESCE(TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE), 0.0) AS k_val,
        | COALESCE(TRY_CAST(event_type AS DOUBLE), 0.0) AS bad_cast
        |FROM events WHERE event_id < 1000""".stripMargin)
}
