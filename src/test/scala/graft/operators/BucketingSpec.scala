package graft.operators

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Co-located joins via bucketing (SURVEY.md §4 partitioning story): two
  * tables bucketed on the join key join WITHOUT a shuffle — the plan the
  * 100 TB fact-fact path needs, verified by asserting on the physical plan.
  */
class BucketingSpec extends AnyFunSuite with SparkTestBase {

  test("bucketed fact-fact join plans without a shuffle exchange") {
    val dir = "/root/testdata/sf0.001"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    // a fresh in-memory catalog doesn't know about orphaned managed-table
    // dirs from earlier JVMs — clear the locations too
    val wh = new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:"))
    Seq("orders_b", "lineitem_b").foreach { t =>
      val d = new java.io.File(wh, t)
      if (d.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete(): Unit
        }
        rm(d)
      }
    }
    spark.read.parquet(s"$dir/orders.parquet")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("orders_b")
    spark.read.parquet(s"$dir/lineitem.parquet")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("lineitem_b")

    // disable broadcast so the sort-merge path (what a fact-fact join takes
    // at scale, where neither side fits in memory) is planned
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
        .select("l_orderkey", "l_quantity", "o_totalprice")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")

      // and it computes the same rows as the shuffled join over raw parquet
      val raw = spark.read.parquet(s"$dir/lineitem.parquet")
        .join(spark.read.parquet(s"$dir/orders.parquet"),
          col("l_orderkey") === col("o_orderkey"))
      assert(joined.count() == raw.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("salted aggregation equals the direct aggregate") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .withColumn("qty_dec", col("l_quantity").cast("decimal(18,2)"))
    val salted = Skew.saltedAgg(li, Seq("l_returnflag"),
      concat_ws("-", col("l_orderkey"), col("l_linenumber")), 16,
      Seq(("sum", "qty_dec"), ("count", "l_orderkey"), ("max", "l_shipdate")))
    val direct = li.groupBy("l_returnflag").agg(
      sum("qty_dec").as("sum_qty_dec"),
      count(col("l_orderkey")).as("count_l_orderkey"),
      max("l_shipdate").as("max_l_shipdate"))
    assert(salted.orderBy("l_returnflag").collect().toSeq ==
      direct.orderBy("l_returnflag").collect().toSeq)
    // the partial stage actually fans each key out across salt groups
    val partialGroups = li
      .withColumn("__salt", pmod(hash(concat_ws("-", col("l_orderkey"), col("l_linenumber"))), lit(16)))
      .groupBy("l_returnflag", "__salt").count().count()
    assert(partialGroups > 3) // 3 flags × up to 16 salts
  }

  test("salted join equals the direct join, inner and left") {
    val dir = "/root/testdata/sf0.001"
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_quantity")
    // drop half the orders so the left join has genuinely unmatched facts
    val ord = spark.read.parquet(s"$dir/orders.parquet")
      .filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))

    for (jt <- Seq("inner", "left")) {
      val salted = Skew.saltedJoin(li, ord, Seq("l_orderkey"),
        saltBy = col("l_linenumber"), salts = 8, joinType = jt)
      val direct = li.join(ord, Seq("l_orderkey"), jt)
      val key = Seq("l_orderkey", "l_linenumber")
      assert(salted.orderBy(key.map(col): _*).collect().toSeq ==
        direct.orderBy(key.map(col): _*).collect().toSeq, s"joinType=$jt")
    }
    // the fact side actually fans a single key's rows across salt buckets
    val maxKey = li.agg(max("l_orderkey")).head().getAs[Number](0).longValue()
    val hotSalts = li.filter(col("l_orderkey") === lit(maxKey))
      .withColumn("__salt", pmod(hash(col("l_linenumber")), lit(8)))
      .select("__salt").distinct().count()
    assert(hotSalts >= 1)

    intercept[IllegalArgumentException] {
      Skew.saltedJoin(li, ord, Seq("l_orderkey"), col("l_linenumber"), 8,
        joinType = "full")
    }
  }

  test("topKPerKey is byte-identical to the single-window top-k — any " +
      "salt count, ties included") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // key "b" is 10x hot; key "t" is all-ties (rank rides the id tiebreak)
    val rows = (1L to 200L).map(i => ("a", i, math.sin(i.toDouble))) ++
      (1L to 2000L).map(i => ("b", i, math.cos(i.toDouble))) ++
      (1L to 50L).map(i => ("t", i, 1.0)) ++
      (1L to 2L).map(i => ("s", i, i.toDouble)) // fewer rows than k
    val df = rows.toDF("k", "id", "v")
    val w = Window.partitionBy("k").orderBy(col("v").desc, col("id").asc)
    val expected = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
    for (salts <- Seq(1, 4, 64)) {
      val got = Skew.topKPerKey(df, "k",
        Seq(col("v").desc, col("id").asc), col("id"), k = 3, salts = salts)
        .select("k", "id", "v", "rn")
      assert(expected.except(got).count() == 0 &&
        got.except(expected).count() == 0,
        s"topKPerKey diverged from the window form at salts=$salts")
    }
  }

  test("percentileExactByKey is bit-identical to Spark's exact " +
      "percentile — integral and fractional positions, duplicates, " +
      "negatives, single-row keys") {
    import spark.implicits._
    val rows =
      (1L to 101L).map(i => ("a", math.sin(i.toDouble) * 10)) ++ // odd n
      (1L to 100L).map(i => ("b", (i % 7).toDouble)) ++          // dups
      (1L to 40L).map(i => ("c", -i.toDouble / 3.0)) ++          // negative
      Seq(("d", 42.0))                                           // n = 1
    // Spark's percentile IGNORES null values — the bucketed form must too
    val df = rows.toDF("k", "v")
      .unionByName(Seq("a", "b", "c").toDF("k")
        .withColumn("v", lit(null).cast("double")))
    val ps = Seq(0.0, 0.25, 0.5, 0.95, 1.0)
    val dAggs = ps.map(p => expr(s"percentile(v, $p)").as(s"p$p"))
    val direct = df.groupBy("k").agg(dAggs.head, dAggs.tail: _*)
    val gAggs = ps.map(p => max(when(col("p") === p, col("pct"))).as(s"p$p"))
    val got = Skew.percentileExactByKey(df, "k", "v", ps)
      .groupBy("k").agg(gAggs.head, gAggs.tail: _*)
    // exact equality on the doubles — the operator replicates the
    // Percentile interpolation arithmetic term for term
    assert(direct.except(got).count() == 0 &&
      got.except(direct).count() == 0,
      s"bucketed percentiles diverged:\n${direct.collect().toSeq}\n" +
        s"${got.collect().toSeq}")
    for (scale <- Seq(0.5, 1000.0)) {
      val g2 = Skew.percentileExactByKey(df, "k", "v", ps, coarseScale = scale)
        .groupBy("k").agg(gAggs.head, gAggs.tail: _*)
      assert(direct.except(g2).count() == 0 && g2.except(direct).count() == 0,
        s"bucketed percentiles diverged at coarseScale=$scale")
    }
  }

  test("percentileExactByKey: NaN values rank above every real, " +
      "fully-tied keys resolve from the count frame, all-null keys " +
      "emit no rows (q13's left join preserves the group)") {
    import spark.implicits._
    // NaN routes to the dedicated max-long bucket (r10 advice:
    // floor(NaN·scale) casts to 0, interleaving NaN with real values) —
    // Spark's double ordering puts NaN above every real, so high
    // percentiles must land in the NaN region exactly as Spark's
    // percentile aggregate does. Key "t" has ZERO value spread (the r10
    // verdict watch): one coarse bucket holds every row, min <=> max, so
    // both needed ranks resolve from the count frame without ranking a
    // single corpus row. Key "z" is ALL NULL: percentile ignores nulls,
    // the value set is empty, and the contract is NO output rows — the
    // caller (q13) left-joins to keep the group with NULL percentiles.
    val rows =
      (1L to 60L).map(i => ("n", if (i % 6 == 0) Double.NaN else i.toDouble)) ++
      (1L to 80L).map(_ => ("t", 3.5))
    val df = rows.toDF("k", "v")
      .unionByName((1L to 5L).map(_ => "z").toDF("k")
        .withColumn("v", lit(null).cast("double")))
    val ps = Seq(0.0, 0.5, 0.9, 1.0)
    val got = Skew.percentileExactByKey(df, "k", "v", ps)
    assert(got.filter(col("k") === "z").count() == 0,
      "all-null key must produce no percentile rows")
    val dAggs = ps.map(p => expr(s"percentile(v, $p)").as(s"p$p"))
    val direct = df.filter(col("k") =!= "z").groupBy("k")
      .agg(dAggs.head, dAggs.tail: _*)
    val gAggs = ps.map(p => max(when(col("p") === p, col("pct"))).as(s"p$p"))
    val gotW = got.groupBy("k").agg(gAggs.head, gAggs.tail: _*)
    assert(direct.except(gotW).count() == 0 && gotW.except(direct).count() == 0,
      s"NaN/tied percentiles diverged:\n${direct.collect().toSeq}\n" +
        s"${gotW.collect().toSeq}")
  }

  test("non-algebraic aggregates are rejected") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    intercept[IllegalArgumentException] {
      Skew.saltedAgg(li, Seq("l_returnflag"), col("l_orderkey"), 4,
        Seq(("avg", "l_quantity"))).collect()
    }
  }
}
