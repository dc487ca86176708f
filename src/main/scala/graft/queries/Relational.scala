package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Core relational operators from SURVEY.md §2 (filters F1-F8, joins J1-J3,
  * aggregations A1-A9, set ops §2.8) expressed over the TPC-H-ish fixtures.
  *
  * Design notes for 100 TB scale:
  *  - groupBy aggregations get map-side partial aggregation from Catalyst for
  *    free; no row explosion before the shuffle.
  *  - dimension joins (nation/region) are explicitly broadcast — at any scale
  *    those tables are tiny, so no shuffle of the fact side.
  *  - filters are plain column predicates on scan columns → pushed into the
  *    parquet reader (PushedFilters), so a date-range query reads a fraction
  *    of the data when the table is date-partitioned/sorted.
  */
object Relational extends QuerySet {

  /** A1 (ref: gold_x12_analytics.py:443-455) — multi-key hash aggregate with
    * count/sum/avg/min/max/countDistinct. TPC-H Q1 shape.
    *
    * Plan shape: a countDistinct MIXED with plain aggregates makes
    * Catalyst plan an `Expand` that replicates every fact row once per
    * distinct group — 2× the corpus through the aggregation exchange (the
    * q08/q55 amplified-intermediate class). Decomposed instead: one plain
    * grouped aggregate (partial-aggregates map-side, no expansion) plus
    * one single-distinct grouped aggregate (two-phase partial on
    * (keys, l_orderkey), still no Expand), joined on the group keys —
    * both post-aggregation frames are group-cardinality-sized, so the
    * join moves rows-per-key counts, never fact data, and the two scans
    * run concurrently (wall = max, not sum). Same result, same oracle;
    * measured 1.90 s → 1.03 s at sf0.1 local[32]. (A single-exchange
    * two-level cascade on (keys, l_orderkey) was measured WORSE — 2.0 s —
    * its level-1 hash aggregate carries seven buffers including
    * non-compact Decimal(28,2) sums across 438k near-distinct groups.
    * The remaining gap to the oracle is decimal-summation cost, not
    * shape: see BASELINE.md's q01 adjudication.)
    */
  def q01(s: SparkSession, dir: String): DataFrame = {
    val li = Q.t(s, dir, "lineitem")
    val base = li.groupBy("l_returnflag", "l_linestatus")
      .agg(
        count(lit(1)).as("cnt"),
        Q.dsum(col("l_quantity")).as("sum_qty"),
        Q.dsum(col("l_extendedprice")).as("sum_price"),
        Q.davg(col("l_discount")).as("avg_disc"),
        min(col("l_shipdate")).as("min_ship"),
        max(col("l_shipdate")).as("max_ship"))
    val dist = li.groupBy("l_returnflag", "l_linestatus")
      .agg(countDistinct(col("l_orderkey")).as("n_orders"))
    base.join(dist, Seq("l_returnflag", "l_linestatus"))
      .select(col("l_returnflag"), col("l_linestatus"), col("cnt"),
        col("sum_qty"), col("sum_price"), col("avg_disc"), col("n_orders"),
        col("min_ship"), col("max_ship"))
  }

  /** F1+F3 (ref: gold_x12_analytics.py:65-74) — date-range + equality filter
    * with narrow projection; both predicates reach the parquet scan.
    */
  def q02(s: SparkSession, dir: String): DataFrame =
    Q.t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp") &&
        col("o_orderstatus") === "O")
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")

  /** J2 (ref: src/sftp/manager.py:178-186 config-lookup join) — two broadcast
    * dimension joins + rollup. nation/region stay tiny at any scale.
    */
  def q03(s: SparkSession, dir: String): DataFrame =
    Q.t(s, dir, "customer")
      .join(broadcast(Q.t(s, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Q.t(s, dir, "region")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(
        count(lit(1)).as("cnt"),
        Q.dsum(col("c_acctbal")).as("sum_bal"))

  /** J1 (ref: init.sql:183-186 bronze↔silver left join + derived duration) —
    * left outer equi-join preserving unmatched left rows; null-safe agg.
    */
  def q04(s: SparkSession, dir: String): DataFrame =
    Q.t(s, dir, "customer")
      .join(Q.t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey", "c_name", "c_mktsegment")
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        coalesce(Q.dsum(col("o_totalprice")), lit(0.0)).as("total_spent"),
        max(col("o_orderdate")).as("last_order"))

  /** J3 (ref: schemas TRN correlation) — inner fact-fact equi-join with
    * post-join filter + revenue expression. The join shuffles both sides on
    * the key; AQE handles skew at scale.
    */
  def q05(s: SparkSession, dir: String): DataFrame =
    Q.t(s, dir, "lineitem")
      .join(Q.t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .filter(col("o_orderstatus") === "F" && col("l_discount") > 0.05)
      .groupBy("o_orderpriority")
      .agg(
        count(lit(1)).as("cnt"),
        Q.dsum4(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))

  /** A2 (ref: gold_x12_analytics.py:608-616) — conditional-sum pivot: one
    * pass, one shuffle, fixed output columns (schema known at plan time).
    */
  def q06(s: SparkSession, dir: String): DataFrame = {
    def cnt(p: String) =
      sum(when(col("o_orderpriority") === p, 1).otherwise(0)).cast("long")
    Q.t(s, dir, "orders")
      .groupBy(year(col("o_orderdate")).as("order_year"))
      .agg(
        count(lit(1)).as("cnt"),
        cnt("1-URGENT").as("n_urgent"),
        cnt("2-HIGH").as("n_high"),
        cnt("3-MEDIUM").as("n_medium"),
        cnt("4-NOT SPECIFIED").as("n_notspec"),
        cnt("5-LOW").as("n_low"))
  }

  /** A3 (ref: gold_x12_analytics.py:737-754 quality histogram) — bucketed
    * conditional counts + min/max/avg + derived percentage with div guard.
    */
  def q07(s: SparkSession, dir: String): DataFrame =
    Q.t(s, dir, "customer")
      .groupBy("c_mktsegment")
      .agg(
        count(lit(1)).as("cnt"),
        sum(when(col("c_acctbal") >= 5000, 1).otherwise(0)).cast("long").as("n_high"),
        sum(when(col("c_acctbal") >= 0 && col("c_acctbal") < 5000, 1).otherwise(0)).cast("long").as("n_mid"),
        sum(when(col("c_acctbal") < 0, 1).otherwise(0)).cast("long").as("n_neg"),
        Q.davg(col("c_acctbal")).as("avg_bal"),
        countDistinct(col("c_nationkey")).as("n_nations"))
      .withColumn("pct_high",
        round(col("n_high").cast("double") / col("cnt") * 100, 4))

  /** A4 (ref: gold_x12_analytics.py:773-790 global KPIs; fixes the reference
    * bug of reading trading_partner_combination before it exists — here the
    * distinct pair is computed inline).
    *
    * Plan shape: THREE countDistincts in one Aggregate make Catalyst plan
    * an `Expand` that replicates every input row once per distinct group
    * (4× the corpus through the aggregation pipeline — at 100 TB, the
    * amplified-intermediate class). Decomposed instead into one plain
    * aggregate plus one single-distinct aggregate per key — each
    * partial-aggregates map-side with NO row expansion — joined as 1-row
    * frames (BroadcastNestedLoopJoin, no exchange). Same result, same
    * oracle; measured 2.4 s → ~0.8 s at sf0.1 local[32].
    */
  def q08(s: SparkSession, dir: String): DataFrame = {
    val li = Q.t(s, dir, "lineitem")
    val basic = li.agg(
      count(lit(1)).as("cnt"),
      Q.dsum(col("l_quantity")).as("sum_qty"),
      sum(when(col("l_returnflag") === "R", 1).otherwise(0)).cast("long")
        .as("n_returned"),
      max(col("l_shipdate")).as("max_ship"))
    val orders = li.agg(countDistinct(col("l_orderkey")).as("n_orders"))
    val parts = li.agg(countDistinct(col("l_partkey")).as("n_parts"))
    // distinct (partkey, suppkey) pairs as a STRUCT key — the r8 concat_ws
    // form allocated a string per fact row before the distinct partial and
    // was q08's single most expensive branch (0.77 s of its 0.85 s at
    // sf0.1; struct 0.52 s, measured r9). Injective at any scale with no
    // range guard, unlike a shifted-long encoding.
    val pairs = li.agg(countDistinct(
      struct(col("l_partkey"), col("l_suppkey"))).as("n_part_supp_pairs"))
    basic.crossJoin(orders).crossJoin(parts).crossJoin(pairs)
      .select(col("cnt"), col("n_orders"), col("n_parts"),
        col("n_part_supp_pairs"), col("sum_qty"), col("n_returned"),
        col("max_ship"))
      .withColumn("pct_returned",
        round(col("n_returned").cast("double") / col("cnt") * 100, 4))
  }

  /** A5 (ref: generate_x12_acknowledgments.py:155-163) — collect_list per
    * group; sorted for determinism (collect order is partition-dependent)
    * and ","-joined because the driver's pandas canonicalizer cannot sort
    * raw array columns (TypeError: unhashable ndarray).
    */
  def q09(s: SparkSession, dir: String): DataFrame =
    Q.t(s, dir, "orders")
      .filter(col("o_totalprice") > 400000)
      .groupBy("o_custkey")
      .agg(
        concat_ws(",",
          transform(sort_array(collect_list(col("o_orderkey"))), _.cast("string")))
          .as("order_keys"),
        count(lit(1)).as("cnt"),
        max(col("o_totalprice")).as("max_price"))

  /** §2.8 set ops — unionByName of two filtered branches. */
  def q19(s: SparkSession, dir: String): DataFrame = {
    val o = Q.t(s, dir, "orders")
    val hi = o.filter(col("o_totalprice") > 450000)
      .select(col("o_orderkey"), col("o_custkey"), lit("high_value").as("tag"))
    val urgent = o.filter(col("o_orderpriority") === "1-URGENT" &&
        col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_custkey"), lit("urgent_final").as("tag"))
    hi.unionByName(urgent)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_agg_multi_key" -> (q01 _),
    "q02_filter_pushdown" -> (q02 _),
    "q03_broadcast_dim_join" -> (q03 _),
    "q04_left_outer_join" -> (q04 _),
    "q05_fact_fact_join" -> (q05 _),
    "q06_conditional_pivot" -> (q06 _),
    "q07_histogram_buckets" -> (q07 _),
    "q08_global_kpis" -> (q08 _),
    "q09_collect_list" -> (q09 _),
    "q19_union_by_name" -> (q19 _))

  val oracles: Map[String, String] = Map(
    "q01_agg_multi_key" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        | round(CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(l_discount), 6) AS avg_disc,
        | count(DISTINCT l_orderkey) AS n_orders,
        | min(l_shipdate) AS min_ship, max(l_shipdate) AS max_ship
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q02_filter_pushdown" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01' AND o_orderstatus = 'O'""".stripMargin,
    "q03_broadcast_dim_join" ->
      """SELECT r_name, n_name, count(*) AS cnt,
        | CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,
    "q04_left_outer_join" ->
      """SELECT c_custkey, c_name, c_mktsegment,
        | count(o_orderkey) AS n_orders,
        | COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS total_spent,
        | max(o_orderdate) AS last_order
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey, c_name, c_mktsegment""".stripMargin,
    "q05_fact_fact_join" ->
      """SELECT o_orderpriority, count(*) AS cnt,
        | CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(22,4))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderstatus = 'F' AND l_discount > 0.05
        |GROUP BY o_orderpriority""".stripMargin,
    "q06_conditional_pivot" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year, count(*) AS cnt,
        | CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent,
        | CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
        | CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS n_medium,
        | CAST(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END) AS BIGINT) AS n_notspec,
        | CAST(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS n_low
        |FROM orders GROUP BY 1""".stripMargin,
    "q07_histogram_buckets" ->
      """SELECT c_mktsegment, count(*) AS cnt,
        | CAST(SUM(CASE WHEN c_acctbal >= 5000 THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
        | CAST(SUM(CASE WHEN c_acctbal >= 0 AND c_acctbal < 5000 THEN 1 ELSE 0 END) AS BIGINT) AS n_mid,
        | CAST(SUM(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_neg,
        | round(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(c_acctbal), 6) AS avg_bal,
        | count(DISTINCT c_nationkey) AS n_nations,
        | round(CAST(SUM(CASE WHEN c_acctbal >= 5000 THEN 1 ELSE 0 END) AS DOUBLE) / count(*) * 100, 4) AS pct_high
        |FROM customer GROUP BY c_mktsegment""".stripMargin,
    "q08_global_kpis" ->
      """SELECT count(*) AS cnt,
        | count(DISTINCT l_orderkey) AS n_orders,
        | count(DISTINCT l_partkey) AS n_parts,
        | count(DISTINCT (CAST(l_partkey AS VARCHAR) || '-' || CAST(l_suppkey AS VARCHAR))) AS n_part_supp_pairs,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_returned,
        | max(l_shipdate) AS max_ship,
        | round(CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS DOUBLE) / count(*) * 100, 4) AS pct_returned
        |FROM lineitem""".stripMargin,
    "q09_collect_list" ->
      """SELECT o_custkey,
        | array_to_string(list_sort(list(o_orderkey)), ',') AS order_keys,
        | count(*) AS cnt, max(o_totalprice) AS max_price
        |FROM orders WHERE o_totalprice > 400000 GROUP BY o_custkey""".stripMargin,
    "q19_union_by_name" ->
      """SELECT o_orderkey, o_custkey, 'high_value' AS tag FROM orders
        |WHERE o_totalprice > 450000
        |UNION ALL
        |SELECT o_orderkey, o_custkey, 'urgent_final' AS tag FROM orders
        |WHERE o_orderpriority = '1-URGENT' AND o_orderstatus = 'F'""".stripMargin)
}
