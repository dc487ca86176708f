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

  test("triangleCounts: hand-built cliques, hub orientation, dedup/direction invariance") {
    import spark.implicits._
    // K4 on {1,2,3,4} (4 triangles, 3 per node) + a pendant edge + an
    // isolated triangle {10,11,12}; edges given in MIXED direction with
    // duplicates — canonicalization must absorb both
    val edges = Seq(
      (1L, 2L), (2L, 1L), (1L, 3L), (1L, 4L), (2L, 3L), (4L, 2L),
      (3L, 4L), (4L, 5L),
      (10L, 11L), (12L, 11L), (10L, 12L), (10L, 12L))
      .toDF("src", "dst")
    val got = Graphs.triangleCounts(edges, "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L,
      10L -> 1L, 11L -> 1L, 12L -> 1L), s"got $got")
    // star + one rim edge: exactly one triangle despite the hub — the
    // degree orientation keeps the hub out of wedge-center duty
    val star = ((1 to 20).map(i => (100L, 100L + i)) :+ (101L, 102L))
      .toDF("src", "dst")
    val starGot = Graphs.triangleCounts(star, "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(starGot == Map(100L -> 1L, 101L -> 1L, 102L -> 1L))
  }
}
