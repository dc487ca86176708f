package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Pins the r9 cents-long `Q.dsum`/`Q.dsum4`/`Q.davg` fast path
  * BIT-IDENTICAL to the reference Decimal forms on 2-decimal money input
  * — the precondition every fixture money column satisfies (l_quantity,
  * l_extendedprice, o_totalprice, c_acctbal, events.value; closest
  * approach to a half-cent tie in the fixtures is 0.4999999963, pure
  * double representation error). The Decimal forms stay available as
  * `dsumDecimal`/`dsum4Decimal` for arbitrary-precision columns; this
  * spec is what makes swapping the default safe.
  */
class DsumCentsSpec extends AnyFunSuite with SparkTestBase {

  test("dsum/davg cents path is bit-identical to the Decimal path on money groups") {
    import spark.implicits._
    val rnd = new scala.util.Random(9)
    for (_ <- 1 to 10) {
      // exact integer cents over the fixtures' magnitude range, negatives
      // (c_acctbal) and nulls included
      val rows = Seq.fill(400)((rnd.nextInt(6),
        if (rnd.nextInt(10) == 0) null
        else java.lang.Double.valueOf((rnd.nextLong() % 50000000L) / 100.0)))
      val df = rows.toDF("k", "x")
      val fast = df.groupBy("k")
        .agg(Q.dsum(col("x")).as("s"), Q.davg(col("x")).as("a"))
        .collect().map(r => (r.get(0), r.get(1), r.get(2))).toSet
      val ref = df.groupBy("k")
        .agg(Q.dsumDecimal(col("x")).as("s"),
          round(Q.dsumDecimal(col("x")) / count(col("x")), 6).as("a"))
        .collect().map(r => (r.get(0), r.get(1), r.get(2))).toSet
      // tuple/boxed-Double equality is doubleToLongBits equality: bit-exact
      assert(fast == ref)
    }
  }

  test("dsum4 cents path matches the Decimal(22,4) path on derived 4-decimal values") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 10) {
      // price * (1 - disc): 2-dec * 2-dec = exact 4-decimal rational, the
      // q05 revenue shape
      val rows = Seq.fill(500)(
        ((100L + rnd.nextInt(10499891)) / 100.0, rnd.nextInt(11) / 100.0))
      val df = rows.toDF("price", "disc")
        .select((col("price") * (lit(1.0) - col("disc"))).as("x"))
      val fast = df.agg(Q.dsum4(col("x"))).head.getDouble(0)
      val ref = df.agg(Q.dsum4Decimal(col("x"))).head.getDouble(0)
      assert(java.lang.Double.doubleToLongBits(fast) ==
        java.lang.Double.doubleToLongBits(ref))
    }
  }

  test("empty and all-null groups return null on both paths") {
    import spark.implicits._
    val df = Seq((1, null: java.lang.Double), (1, null: java.lang.Double))
      .toDF("k", "x")
    val r = df.groupBy("k")
      .agg(Q.dsum(col("x")).as("f"), Q.dsumDecimal(col("x")).as("d")).head
    assert(r.isNullAt(1) && r.isNullAt(2))
  }

  test("dsum sums on a compact long buffer (no Decimal in the aggregate)") {
    val li = Q.t(spark, "/root/testdata/sf0.001", "lineitem")
    val plan = li.groupBy("l_returnflag")
      .agg(Q.dsum(col("l_quantity")).as("s"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"))
    assert(!plan.toLowerCase.contains("decimal"),
      s"cents path must not carry Decimal buffers:\n$plan")
  }
}
