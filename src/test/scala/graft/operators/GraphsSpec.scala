package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class GraphsSpec extends AnyFunSuite with SparkTestBase {

  test("pageRank: hand-computed tiny graph, teleport-only sinks, near-mass-conservation") {
    import spark.implicits._
    // 1 -> 2, 1 -> 3, 2 -> 3, 3 -> 1 : node 3 collects two in-edges
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val got = Graphs.pageRank(edges, "src", "dst", iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // replicate the fixed-point arithmetic exactly
    val S = Graphs.RankScale
    val n = 3L
    val base = math.floor(0.15 * S / n).toLong
    def contrib(rq: Long, outdeg: Long): Long =
      math.floor(0.85 * rq / outdeg).toLong
    var r = Map(1L -> math.floor(S.toDouble / n).toLong,
      2L -> math.floor(S.toDouble / n).toLong,
      3L -> math.floor(S.toDouble / n).toLong)
    for (_ <- 1 to 2) {
      r = Map(
        1L -> (base + contrib(r(3L), 1)),
        2L -> (base + contrib(r(1L), 2)),
        3L -> (base + contrib(r(1L), 2) + contrib(r(2L), 1)))
    }
    assert(got == r, s"$got vs $r")
    // node 3 (two in-edges) outranks node 2 (one weak in-edge)
    assert(got(3L) > got(2L))
    // mass stays within the damping envelope: total <= 2^40, and above
    // the teleport floor
    val total = got.values.sum
    assert(total <= S && total > 3 * base)

    // a node with no in-edges settles at exactly the teleport base
    val noIn = Seq((1L, 2L), (2L, 1L), (3L, 1L)).toDF("src", "dst")
    val noInRanks = Graphs.pageRank(noIn, "src", "dst", iters = 3)
      .collect().map(r2 => r2.getLong(0) -> r2.getLong(1)).toMap
    assert(noInRanks(3L) == base)
    assert(noInRanks(1L) > noInRanks(3L))
  }
}
