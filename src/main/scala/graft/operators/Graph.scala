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

    // The raw edge frame is NOT checkpointed: it is read only while
    // building nodes and eDeg, recomputing it is a projected scan, and
    // an eager checkpoint would pay a full extra materialization pass.
    val e = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
    val nodes = e.select(col("__src").as("id"))
      .union(e.select(col("__dst").as("id")))
      .distinct()
      .localCheckpoint(true)
    // out-degree is joined into the edge list ONCE, outside the loop —
    // inside it would add a full edge-sized join per iteration. The
    // degree table is one row per distinct source, so the join back to
    // the edges is AQE-broadcast and never shuffles the edge list; the
    // LAZY checkpoint materializes it on the first iteration and every
    // later iteration reads the cached copy.
    val eDeg = e.join(
        e.groupBy(col("__src")).agg(count(lit(1)).as("__deg")), "__src")
      .localCheckpoint(false)

    var ranks = nodes.withColumn("rank", lit(1.0)).localCheckpoint(true)
    for (_ <- 1 to iterations) {
      val contribs = eDeg
        .join(ranks.withColumnRenamed("id", "__src"), "__src")
        .select(col("__dst").as("id"), (col("rank") / col("__deg")).as("__c"))
        .groupBy(col("id")).agg(sum(col("__c")).as("__in"))
      // LAZY checkpoint: with a fixed iteration count there is no
      // driver action inside the loop, so eager materialization would
      // pay one synchronous job barrier per round for nothing — lazy
      // still truncates lineage and caches each rank frame on first
      // use, but lets Spark run the whole cascade as one job chain
      // (connectedComponents needs eager only because its convergence
      // count() acts per round)
      ranks = nodes
        .join(contribs, Seq("id"), "left")
        .select(col("id"),
          (lit(1.0 - damping) + lit(damping) * coalesce(col("__in"), lit(0.0)))
            .as("rank"))
        .localCheckpoint(false)
    }
    ranks
  }
}
