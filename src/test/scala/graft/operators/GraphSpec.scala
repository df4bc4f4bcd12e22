package graft.operators

import org.apache.spark.sql.functions.{greatest, hash, least, lit, pmod}
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

  test("triangles: hand graphs — K4, triangle+tail, bipartite has none") {
    def count(edges: Seq[(Long, Long)]): Map[Long, Long] =
      Graph.triangles(edges.toDF("a", "b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // K4: every node is in C(3,2)=3 triangles
    val k4 = for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j)
    assert(count(k4) === Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
    // triangle 1-2-3 with tail 3-4: tail node has zero
    assert(count(Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L))) ===
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 0L))
    // complete bipartite K2,3 is triangle-free
    val kb = for (i <- 0L to 1L; j <- 10L to 12L) yield (i, j)
    assert(count(kb).values.forall(_ == 0L))
    // duplicates / reversed edges / self-loops don't inflate counts
    assert(count(Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 1L), (3L, 1L))) ===
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("triangles: oriented wedge plan matches the naive triple join on a random graph") {
    val edges = spark.range(400).select(
      pmod(hash($"id" * 7), lit(60)).cast("long").as("a"),
      pmod(hash($"id" * 13 + 1), lit(60)).cast("long").as("b"))
    val fast = Graph.triangles(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val und = edges.filter($"a" =!= $"b")
      .select(least($"a", $"b").as("u"), greatest($"a", $"b").as("v")).distinct()
    und.createOrReplaceTempView("gs_e0")
    val naive = spark.sql(
      """SELECT id, COUNT(*) AS t FROM (
        |  SELECT a.u AS id FROM gs_e0 a JOIN gs_e0 b ON b.u = a.v
        |    JOIN gs_e0 c ON c.u = a.u AND c.v = b.v
        |  UNION ALL
        |  SELECT a.v FROM gs_e0 a JOIN gs_e0 b ON b.u = a.v
        |    JOIN gs_e0 c ON c.u = a.u AND c.v = b.v
        |  UNION ALL
        |  SELECT b.v FROM gs_e0 a JOIN gs_e0 b ON b.u = a.v
        |    JOIN gs_e0 c ON c.u = a.u AND c.v = b.v) x
        |GROUP BY id""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast.filter(_._2 > 0) === naive)
  }

  test("jaccardLinks: square predicts both diagonals at jaccard 1, skips adjacent pairs") {
    // cycle 1-2-3-4: non-adjacent (1,3) and (2,4) share both neighbors
    val links = Graph.jaccardLinks(
        Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("a", "b"),
        minCommon = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(links === Seq((1L, 3L, 2L, 1.0), (2L, 4L, 2L, 1.0)))
  }

  test("jaccardLinks: hub cap drops only wedges centered at the hub, deterministically") {
    // star center 0 with leaves 1..5, plus edge 1-2: with the cap at 2
    // the hub can't serve as a center, so only wedges through 1 and 2
    // survive — (0,x) pairs are adjacent anyway; no predictions remain
    // except leaf pairs via the hub, which the cap removes
    val edges = ((1L to 5L).map(i => (0L, i)) :+ (1L, 2L)).toDF("a", "b")
    val capped = Graph.jaccardLinks(edges, minCommon = 1L, maxHubDegree = 2)
      .collect()
    assert(capped.isEmpty)
    val uncapped = Graph.jaccardLinks(edges, minCommon = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // via the hub: all C(5,2) leaf pairs minus the adjacent (1,2)
    assert(uncapped === (for (i <- 1L to 5L; j <- (i + 1) to 5L) yield (i, j))
      .toSet - ((1L, 2L)))
  }

  test("labelPropagation refuses non-integral node ids instead of emitting null labels") {
    val e = intercept[IllegalArgumentException](
      Graph.labelPropagation(Seq(("a", "b"), ("b", "c")).toDF("a", "b"), rounds = 2))
    assert(e.getMessage.contains("integral"))
  }

  test("labelPropagation: two cliques with a bridge converge to their min labels") {
    val cliqueA = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val cliqueB = for (i <- 11L to 14L; j <- (i + 1) to 14L) yield (i, j)
    val edges = (cliqueA ++ cliqueB :+ (4L, 11L)).toDF("a", "b")
    val labels = Graph.labelPropagation(edges, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 4L).forall(labels(_) == 1L), labels.toString)
    assert((12L to 14L).forall(labels(_) == 11L), labels.toString)
    // layout invariance: same result from a different partitioning
    val again = Graph.labelPropagation(edges.repartition(17), rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels === again)
  }

  private def spMap(
      edges: Seq[(Long, Long, Long)], seeds: Seq[Long], hops: Int): Map[Long, Long] =
    Graph.shortestPaths(
        edges.toDF("src", "dst", "w"), seeds.toDF("id"), hops)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("shortestPaths: cheaper long route beats the expensive direct edge") {
    // 1 -> 3 costs 10 direct, but 1 -> 2 -> 3 costs 3: the 2-hop path
    // must WIN even though the 1-hop relaxation reaches 3 first
    val edges = Seq((1L, 3L, 10L), (1L, 2L, 1L), (2L, 3L, 2L))
    spMap(edges, Seq(1L), 4) shouldBe Map(1L -> 0L, 2L -> 1L, 3L -> 3L)
  }

  test("shortestPaths: hop bound truncates, multi-seed takes the min") {
    val chain = Seq((1L, 2L, 5L), (2L, 3L, 5L), (3L, 4L, 5L))
    spMap(chain, Seq(1L), 2) shouldBe Map(1L -> 0L, 2L -> 5L, 3L -> 10L)
    // seed 4 keeps dist 0; seed 1's route to it never improves on that
    spMap(chain, Seq(1L, 4L), 3) shouldBe
      Map(1L -> 0L, 2L -> 5L, 3L -> 10L, 4L -> 0L)
  }

  test("pageRank: null edge endpoints are dropped, not silently cascading node loss") {
    val clean = Seq((5L, 6L), (6L, 5L)).toDF("src", "dst")
    val dirty = Seq((Some(5L), Some(6L)), (Some(6L), Some(5L)),
      (None, Some(5L)), (Some(6L), None)).toDF("src", "dst")
    def ranks(df: org.apache.spark.sql.DataFrame) =
      Graph.pageRank(df, iterations = 5)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ranks(dirty) === ranks(clean)) // no phantom null node, 5 survives
  }

  test("bfs: null endpoints and null seeds produce no phantom rows") {
    val edges = Seq((Some(1L), Some(2L)), (Some(1L), None), (None, Some(9L)))
      .toDF("src", "dst")
    val out = Graph.bfs(edges, Seq(Some(1L), Option.empty[Long]).toDF("id"), 4)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(out === Map(1L -> 0, 2L -> 1))
  }

  test("shortestPaths: null dst edges cannot accumulate phantom rows") {
    val edges = Seq((Some(1L), Some(2L), 1L), (Some(1L), None, 1L),
      (Some(2L), None, 1L)).toDF("src", "dst", "w")
    val out = Graph.shortestPaths(edges, Seq(1L).toDF("id"), maxHops = 100)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 0L, 2L -> 1L))
  }

  test("labelPropagation refuses a non-integral SECOND endpoint column too") {
    val e = Seq((1L, "x")).toDF("a", "b")
    val err = intercept[IllegalArgumentException](
      Graph.labelPropagation(e, rounds = 1))
    assert(err.getMessage.contains("'b'"))
  }

  test("shortestPaths: null-weight edges are no edges and cannot pin the frontier open") {
    val edges = Seq((1L, Some(2L), Some(1L)), (1L, Some(3L), None))
      .map { case (s, d, w) => (s, d.get, w) }
      .toDF("src", "dst", "w")
    val out = Graph.shortestPaths(edges, Seq(1L).toDF("id"), maxHops = 500)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 0L, 2L -> 1L)) // 3 unreachable, no null dist
  }

  test("shortestPaths: drains early on a cycle instead of looping maxHops") {
    // positive-weight cycle: after both nodes settle no distance can
    // improve — a huge hop budget must not cost a huge job count
    val edges = Seq((1L, 2L, 1L), (2L, 1L, 1L))
    spMap(edges, Seq(1L), 1000) shouldBe Map(1L -> 0L, 2L -> 1L)
  }
}
