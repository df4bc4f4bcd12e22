package graft.operators

import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Pins [[Graph.pageRank]]'s simplified-PageRank contract on graphs with
  * closed-form fixed points, plus the distributed invariants (mass
  * conservation without sinks, partition-layout invariance, parallel
  * edge honoring).
  */
class GraphSpec extends SparkSpec with Matchers {
  import spark.implicits._

  private val eps = 1e-6

  test("two-node cycle converges to rank 1 each (mass conserved)") {
    val ranks = Graph.pageRank(
        Seq((1L, 2L), (2L, 1L)).toDF("src", "dst"), iterations = 30)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    ranks(1L) shouldBe 1.0 +- eps
    ranks(2L) shouldBe 1.0 +- eps
  }

  test("star graph matches the closed form") {
    // leaves a,b,c (ids 2,3,4) each point at hub 1; hub has no out-edges.
    // Leaves receive nothing: rank = 0.15 from iteration 1 onward.
    // Hub: 0.15 + 0.85 * (3 * 0.15 / 1) = 0.5325 once leaves settle.
    val ranks = Graph.pageRank(
        Seq((2L, 1L), (3L, 1L), (4L, 1L)).toDF("src", "dst"), iterations = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    ranks(2L) shouldBe 0.15 +- eps
    ranks(3L) shouldBe 0.15 +- eps
    ranks(1L) shouldBe 0.5325 +- eps
  }

  test("chain ranks order by depth and sink keeps its mass bounded") {
    // 1 -> 2 -> 3: rank(1) = 0.15, rank(2) = 0.15 + 0.85*0.15 = 0.2775,
    // rank(3) = 0.15 + 0.85*0.2775 = 0.385875 at the fixed point.
    val ranks = Graph.pageRank(
        Seq((1L, 2L), (2L, 3L)).toDF("src", "dst"), iterations = 30)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    ranks(1L) shouldBe 0.15 +- eps
    ranks(2L) shouldBe 0.2775 +- eps
    ranks(3L) shouldBe 0.385875 +- eps
  }

  test("cycle of n nodes: every rank is exactly 1 (uniform fixed point)") {
    val n = 20L
    val edges = (1L to n).map(i => (i, i % n + 1)).toDF("src", "dst")
    val ranks = Graph.pageRank(edges, iterations = 25).collect()
    ranks.length shouldBe n
    all(ranks.map(_.getDouble(1))) shouldBe 1.0 +- eps
  }

  test("parallel edges each contribute (a double edge doubles the share)") {
    // 1 has out-deg 3 across edges {1->2 x2, 1->3 x1}: node 2 gets 2/3
    // of 1's mass, node 3 gets 1/3.
    val ranks = Graph.pageRank(
        Seq((1L, 2L), (1L, 2L), (1L, 3L)).toDF("src", "dst"),
        iterations = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    ranks(2L) shouldBe (0.15 + 0.85 * (2.0 / 3.0) * 0.15) +- eps
    ranks(3L) shouldBe (0.15 + 0.85 * (1.0 / 3.0) * 0.15) +- eps
  }

  test("partition-layout invariance (within float tolerance)") {
    val edges = (1L to 200L).map(i => (i, (i * 7) % 200 + 1)).toDF("src", "dst")
    val a = Graph.pageRank(edges.repartition(1), iterations = 8)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = Graph.pageRank(edges.repartition(17), iterations = 8)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    a.keySet shouldBe b.keySet
    a.foreach { case (k, v) => v shouldBe b(k) +- 1e-9 }
  }

  // ------------------------------------------------------------- bfs

  private def bfsMap(edges: Seq[(Long, Long)], seeds: Seq[Long],
      maxHops: Int): Map[Long, Int] =
    Graph.bfs(edges.toDF("src", "dst"), seeds.toDF("id"), maxHops)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("bfs: chain distances are hop counts, bounded by maxHops") {
    // 1 -> 2 -> 3 -> 4 -> 5, seed 1, maxHops 3: node 5 is out of reach
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    bfsMap(chain, Seq(1L), 3) shouldBe Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3)
  }

  test("bfs: multi-source takes the minimum distance over seeds") {
    // seed 5 is also reachable from seed 1 at dist 4 — it must KEEP
    // dist 0 (a later frontier never overwrites an earlier visit)
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    bfsMap(chain, Seq(1L, 5L), 4) shouldBe
      Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3, 5L -> 0)
  }

  test("bfs: directed edges are not followed backward") {
    bfsMap(Seq((1L, 2L)), Seq(2L), 5) shouldBe Map(2L -> 0)
  }

  test("bfs: early-stops on an exhausted frontier (cycle smaller than maxHops)") {
    // triangle cycle, maxHops 50 — completes without 50 iterations and
    // every node keeps its first (minimal) distance
    val tri = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    bfsMap(tri, Seq(1L), 50) shouldBe Map(1L -> 0, 2L -> 1, 3L -> 2)
  }

  test("bfs: seed-only graph at maxHops 0; duplicate seeds dedupe") {
    bfsMap(Seq((1L, 2L)), Seq(1L, 1L), 0) shouldBe Map(1L -> 0)
  }

  test("bfs: distances are layout-invariant") {
    val edges = (1L to 300L).map(i => (i, (i * 13) % 300 + 1))
    val a = bfsMap(edges, Seq(1L), 4)
    val b = Graph.bfs(edges.toDF("src", "dst").repartition(23),
        Seq(1L).toDF("id"), 4)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    a shouldBe b
  }
}
