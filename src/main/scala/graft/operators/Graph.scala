package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph centrality over edge DataFrames — the second graph
  * operator next to [[Dedup.connectedComponents]]. Where CC answers
  * "which documents are the same", PageRank answers "which node is
  * central" (canonical-document election inside big near-dup clusters,
  * hub detection in citation/link corpora).
  *
  * Scale: each iteration is ONE equi-join (edges ⋈ ranks on src) + ONE
  * aggregation (contributions by dst) — both shuffle on the node id, no
  * all-pairs step anywhere. The rank frame is `localCheckpoint`ed per
  * iteration (same discipline as connectedComponents) so the lineage
  * stays O(1) instead of O(iterations) and AQE re-plans each round on
  * materialized sizes. Edge skew (a celebrity in-node) is an aggregation
  * hot key, absorbed by partial aggregation map-side — contributions
  * combine before the shuffle.
  */
object Graph {

  /** Simplified PageRank (the Brin–Page iteration without dangling-mass
    * redistribution; documented contract, pinned in GraphSpec):
    *
    *   rank(v) = (1-d) + d * Σ_{u→v} rank(u) / outdeg(u)
    *
    * run for exactly `iterations` rounds from rank = 1. Nodes are the
    * UNION of sources and destinations; sinks (no out-edges) keep
    * receiving but never emit, so total mass can shrink below N — the
    * classic simplified variant.
    *
    * Input: edges with columns (`srcCol`, `dstCol`); parallel edges are
    * honored (each contributes), self-loops allowed.
    * Output: (id, rank) — one row per node.
    */
  def pageRank(
      edges: DataFrame,
      iterations: Int = 10,
      damping: Double = 0.85,
      srcCol: String = "src",
      dstCol: String = "dst"): DataFrame = {
    require(iterations >= 1, s"need at least one iteration, got $iterations")
    require(damping > 0 && damping < 1, s"damping must be in (0,1), got $damping")

    val e = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
      .localCheckpoint(true)
    val nodes = e.select(col("__src").as("id"))
      .union(e.select(col("__dst").as("id")))
      .distinct()
      .localCheckpoint(true)
    val outDeg = e.groupBy(col("__src")).agg(count(lit(1)).as("__deg"))
      .localCheckpoint(true)

    var ranks = nodes.withColumn("rank", lit(1.0)).localCheckpoint(true)
    for (_ <- 1 to iterations) {
      val contribs = e
        .join(ranks.withColumnRenamed("id", "__src"), "__src")
        .join(outDeg, "__src")
        .select(col("__dst").as("id"), (col("rank") / col("__deg")).as("__c"))
        .groupBy(col("id")).agg(sum(col("__c")).as("__in"))
      ranks = nodes
        .join(contribs, Seq("id"), "left")
        .select(col("id"),
          (lit(1.0 - damping) + lit(damping) * coalesce(col("__in"), lit(0.0)))
            .as("rank"))
        .localCheckpoint(true)
    }
    ranks
  }
}
