package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Iterative link-graph analytics. [[TextDedup.dupClusters]] covers the
  * connectivity side (pointer-jumping components); this object adds the
  * authority side — the domain/page weighting a crawl-curation pipeline
  * uses to prioritize sources.
  */
object Graphs {

  /** Fixed-point scale: ranks are carried as longs in units of 2^-40, so
    * every per-round summation is EXACT integer addition — partition
    * order, partial aggregation and engine never change a result the way
    * double summation order would.
    */
  val RankScale: Long = 1L << 40

  /** PageRank over an edge list (src, dst), `iters` synchronous rounds at
    * the given damping, uniform init. Returns (node, rank_q) with rank_q
    * the fixed-point rank (divide by [[RankScale]] for the double).
    *
    * Determinism contract (the kmeansFit/sessionization stance): the only
    * floating-point op per edge is `floor(damping * rank_q / outdeg)` —
    * two IEEE double ops in a pinned order then a floor, bit-identical in
    * any engine — and everything that gets SUMMED is a long, so the
    * result is reproducible across engines, partitionings and retries,
    * making a fixed-iteration run fully hash-oracleable (q47 unrolls the
    * same three rounds in DuckDB).
    *
    * Scale shape: node frame = distinct endpoints (one shuffle, built
    * once); per round, ONE join of the O(nodes) rank frame to the edge
    * list on src (AQE picks the strategy) and one dst-keyed aggregate —
    * the rank frame is localCheckpointed per round (the dupClusters
    * iterative discipline) so lineage stays flat. Dangling-node mass is
    * dropped (the standard simplification); nodes with no in-edges keep
    * the teleport base. k rounds = k jobs, each O(edges) — never more.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, damping: Double = 0.85): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(damping > 0 && damping < 1, s"damping must be in (0,1), got $damping")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .localCheckpoint(false)
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .distinct().localCheckpoint(false)
    val n = nodes.count()
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
      .localCheckpoint(false)
    val base = math.floor((1.0 - damping) * RankScale / n).toLong
    var ranks = nodes.select(col("node"),
      lit(math.floor(RankScale.toDouble / n).toLong).as("rank_q"))
      .localCheckpoint(false)
    for (_ <- 1 to iters) {
      val contribs = e
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .join(outdeg, Seq("src"))
        .select(col("dst"),
          floor(lit(damping) * col("rank_q") / col("outdeg"))
            .cast("long").as("__c"))
        .groupBy("dst").agg(sum(col("__c")).as("__in"))
      ranks = nodes
        .join(contribs.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select(col("node"),
          (lit(base) + coalesce(col("__in"), lit(0L))).as("rank_q"))
        .localCheckpoint(false)
    }
    ranks
  }
}
