package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class LayoutSpec extends AnyFunSuite with SparkTestBase {

  test("mortonKey interleaves bits exactly; zorderBy range-partitions and clusters both dims") {
    import spark.implicits._
    def ref(a: Int, b: Int, bits: Int): Long =
      (0 until bits).map { i =>
        (((a >> i) & 1).toLong << (2 * i)) | (((b >> i) & 1).toLong << (2 * i + 1))
      }.sum
    // hand values: a=0b11,b=0 -> 0b0101; a=0,b=0b11 -> 0b1010
    assert(ref(3, 0, 8) == 5L && ref(0, 3, 8) == 10L)
    val pairs = for (a <- 0 until 16; b <- 0 until 16) yield (a, b)
    val got = pairs.toDF("a", "b")
      .select(col("a"), col("b"),
        Layout.mortonKey(col("a"), col("b"), bits = 8).as("z"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    for ((a, b) <- pairs)
      assert(got((a, b)) == ref(a, b, 8), s"morton($a,$b)")

    // zorderBy: range exchange on the key, sorted within partitions, and
    // each partition covers a BOUNDED slice of both dimensions (the
    // file-skipping property a z-ordered write exists for)
    val df = (0 until 4096).map(i => (i % 64, (i * 7) % 64)).toDF("u", "h")
    val z = Layout.zorderBy(df,
      Layout.mortonKey(col("u"), col("h"), 6), partitions = 8)
    val plan = z.queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"), s"expected range exchange:\n$plan")
    val spans = z.select(col("u"), col("h"))
      .withColumn("__p", spark_partition_id())
      .groupBy("__p")
      .agg((max("u") - min("u")).as("du"), (max("h") - min("h")).as("dh"))
      .collect()
    // with 8 partitions over a 64x64 grid, a z-ordered partition never
    // spans the full range of BOTH dimensions at once
    assert(spans.forall(r => r.getInt(1) < 63 || r.getInt(2) < 63),
      spans.mkString(", "))
  }
}
