package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout utilities for the write side of a 100 TB corpus: how rows
  * are ordered INTO files decides how much a later query can skip. A
  * single-column sort clusters one predicate dimension and destroys the
  * others; a Morton (Z-order) key interleaves the bits of several
  * dimensions so files stay roughly clustered in ALL of them — the
  * standard multi-dimensional clustering trick behind z-ordered lakehouse
  * layouts, here as a plain column expression + a range-partitioned sort,
  * no engine extension needed.
  */
object Layout {

  /** Morton (Z-order) interleave of the low `bits` bits of two
    * non-negative integer columns: result bit 2i is a's bit i, bit 2i+1
    * is b's bit i. Pure codegen arithmetic (shift/mask/multiply-add — the
    * same expression any SQL engine evaluates identically); `bits` ≤ 31
    * keeps the key in a long. Inputs must be non-negative and fit in
    * `bits` bits for the key to be order-meaningful (mask/`pmod` them
    * first — the caller owns the dimension encoding).
    */
  def mortonKey(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).map { i =>
      shiftright(a, i).bitwiseAND(lit(1)).cast("long") * lit(1L << (2 * i)) +
        shiftright(b, i).bitwiseAND(lit(1)).cast("long") * lit(1L << (2 * i + 1))
    }.reduce(_ + _)
  }

  /** Z-order the frame for writing: range-partition on the Morton key
    * (contiguous key ranges per output file → min/max file statistics
    * stay tight in BOTH dimensions) and sort within partitions. The
    * range exchange samples the key distribution, so skew in either
    * dimension still yields balanced files.
    */
  def zorderBy(df: DataFrame, key: Column, partitions: Int): DataFrame =
    df.repartitionByRange(partitions, key).sortWithinPartitions(key)
}
