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

  /** Per-node triangle counts over an undirected graph — the local
    * clustering signal of a link/similarity graph (communities, spam
    * farms, near-duplicate cliques). Exact integer counts, so the result
    * hash-matches any engine.
    *
    * Scale shape: the naive wedge join enumerates Σ deg² candidate
    * wedges — a hub node alone can exceed the whole graph. This is the
    * DEGREE-ORIENTED form (compact-forward): each canonical edge orients
    * from its lower-(degree, id) endpoint to the higher one, wedges are
    * enumerated only around each edge's LOW end, and a wedge closes by
    * joining the canonical edge set once more. Candidate volume drops to
    * Σ outdeg² with outdeg ≤ O(√edges) for every node — the hub's
    * wedges are charged to its low-degree neighbors. Three key-bounded
    * shuffles (degree census, wedge self-join, closing join); no
    * broadcast of anything graph-sized.
    *
    * @return (node, n_triangles) for every node in ≥ 1 triangle
    */
  def triangleCounts(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(false)
    val deg = und.select(explode(array(col("a"), col("b"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val oriented = und
      .join(deg.select(col("node").as("a"), col("deg").as("da")), Seq("a"))
      .join(deg.select(col("node").as("b"), col("deg").as("db")), Seq("b"))
      .select(when(col("da") < col("db")
          || (col("da") === col("db") && col("a") < col("b")),
          struct(col("a").as("u"), col("b").as("v")))
        .otherwise(struct(col("b").as("u"), col("a").as("v"))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
    // wedges around each LOW endpoint; (v, w) kept canonical so the
    // closing join probes the und set directly
    val wedges = oriented
      .join(oriented.select(col("u"), col("v").as("w")), Seq("u"))
      .filter(col("v") < col("w"))
    val tri = wedges.join(
      und.select(col("a").as("v"), col("b").as("w")).hint("shuffle_hash"),
      Seq("v", "w"))
    tri.select(explode(array(col("u"), col("v"), col("w"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
  }
}
