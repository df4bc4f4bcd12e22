package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Graph

/** Round-6 batch 5: graph analytics over the co-purchase part graph —
  * exact triangle counting (degree-ordered orientation), common-
  * neighbor / Jaccard link prediction (hub-capped wedge centers), and
  * deterministic synchronous label propagation. The graph: parts are
  * connected when they appear in the same order (every-20th order, so
  * the gate slice stays bounded at any SF); classic co-occurrence
  * graph, triangles abound because orders hold up to 7 parts.
  *
  * All three are HASH-GREEN: the algorithms are deterministic by
  * construction (explicit orientations and tie-breaks), so DuckDB
  * replays them relationally — the naive triple-join for triangles,
  * the same capped wedge generation for links, QUALIFY-free windowed
  * mode for LPA — and values must match bit for bit.
  */
object Round6Ops5 {

  /** Co-purchase edges: (u, v) part pairs sharing an order, u < v. */
  private def coPurchase(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
      .filter(col("l_orderkey") % 20 === 0)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    li.as("a").join(li.as("b"), Seq("ok"))
      .filter(col("a.pk") < col("b.pk"))
      .select(col("a.pk").as("a"), col("b.pk").as("b"))
      .distinct()
  }

  private val edgeCte =
    """e0 AS (
      |  SELECT DISTINCT l1.l_partkey AS u, l2.l_partkey AS v
      |  FROM lineitem l1 JOIN lineitem l2 ON l1.l_orderkey = l2.l_orderkey
      |  WHERE l1.l_orderkey % 20 = 0 AND l1.l_partkey < l2.l_partkey)""".stripMargin

  /** Exact PER-NODE triangle counts. Spark runs the degree-ordered-
    * orientation operator (one wedge per triangle, O(√m) max
    * out-degree — see [[Graph.triangles]]); DuckDB counts the same
    * triangles with the naive ordered triple join (u<v<w) and credits
    * all three corners. Equality proves the oriented plan loses and
    * invents nothing. (Distinct from the round-4 `graph_triangles`
    * gate, which pins a GLOBAL count via the same SQL on both engines —
    * this one proves the native operator against an independent plan.)
    */
  val graph_triangles_oriented = OpQuery(
    "graph_triangles_oriented",
    s"""WITH $edgeCte,
      |tri AS (
      |  SELECT a.u, a.v, b.v AS w
      |  FROM e0 a JOIN e0 b ON b.u = a.v JOIN e0 c ON c.u = a.u AND c.v = b.v),
      |credit AS (
      |  SELECT u AS id FROM tri
      |  UNION ALL SELECT v FROM tri
      |  UNION ALL SELECT w FROM tri)
      |SELECT id, CAST(COUNT(*) AS BIGINT) AS triangles
      |FROM credit GROUP BY id
      |ORDER BY triangles DESC, id
      |LIMIT 50""".stripMargin) { (spark, dir) =>
    Graph.triangles(coPurchase(spark, dir))
      .filter(col("triangles") > 0)
      .orderBy(col("triangles").desc, col("id"))
      .limit(50)
  }

  /** Jaccard link prediction, wedge centers capped at degree 50 (the
    * deterministic hub bound the operator documents; the oracle applies
    * the identical cap). Non-adjacent pairs with ≥ 3 shared neighbors,
    * top-30 by score.
    */
  val graph_jaccard_links = OpQuery(
    "graph_jaccard_links",
    s"""WITH $edgeCte,
      |deg AS (
      |  SELECT id, COUNT(*) AS d FROM (
      |    SELECT u AS id FROM e0 UNION ALL SELECT v FROM e0) n
      |  GROUP BY id),
      |adj AS (
      |  SELECT u AS ctr, v AS nbr FROM e0
      |  UNION ALL SELECT v, u FROM e0),
      |centers AS (
      |  SELECT adj.ctr, adj.nbr FROM adj
      |  JOIN deg ON deg.id = adj.ctr AND deg.d <= 50),
      |pairs AS (
      |  SELECT x.nbr AS a, y.nbr AS b, COUNT(*) AS common
      |  FROM centers x JOIN centers y ON x.ctr = y.ctr AND x.nbr < y.nbr
      |  GROUP BY x.nbr, y.nbr
      |  HAVING COUNT(*) >= 3),
      |non_adj AS (
      |  SELECT p.* FROM pairs p
      |  LEFT JOIN e0 ON e0.u = p.a AND e0.v = p.b
      |  WHERE e0.u IS NULL)
      |SELECT n.a, n.b, CAST(n.common AS BIGINT) AS common,
      |       CAST(ROUND(CAST(n.common AS DOUBLE) / (da.d + db.d - n.common), 6)
      |         AS DOUBLE) AS jaccard
      |FROM non_adj n
      |JOIN deg da ON da.id = n.a
      |JOIN deg db ON db.id = n.b
      |ORDER BY jaccard DESC, n.a, n.b
      |LIMIT 30""".stripMargin) { (spark, dir) =>
    Graph.jaccardLinks(coPurchase(spark, dir), minCommon = 3L, maxHubDegree = 50)
      .select(col("a"), col("b"), col("common"),
        round(col("jaccard"), 6).cast("double").as("jaccard"))
      .orderBy(col("jaccard").desc, col("a"), col("b"))
      .limit(30)
  }

  /** Two synchronous label-propagation rounds (min-label tie-break),
    * reported as the label histogram. The oracle replays both rounds
    * with windowed modes — determinism of the tie-break is exactly what
    * makes this gate possible.
    */
  val graph_lpa = OpQuery(
    "graph_lpa",
    s"""WITH $edgeCte,
      |adj AS (
      |  SELECT u AS id, v AS nbr FROM e0
      |  UNION ALL SELECT v, u FROM e0),
      |l0 AS (SELECT DISTINCT id, CAST(id AS BIGINT) AS label FROM adj),
      |l1 AS (
      |  SELECT id, label FROM (
      |    SELECT a.id, l.label, COUNT(*) AS n,
      |           ROW_NUMBER() OVER (PARTITION BY a.id
      |             ORDER BY COUNT(*) DESC, l.label ASC) AS rn
      |    FROM adj a JOIN l0 l ON l.id = a.nbr
      |    GROUP BY a.id, l.label) t
      |  WHERE rn = 1),
      |l2 AS (
      |  SELECT id, label FROM (
      |    SELECT a.id, l.label, COUNT(*) AS n,
      |           ROW_NUMBER() OVER (PARTITION BY a.id
      |             ORDER BY COUNT(*) DESC, l.label ASC) AS rn
      |    FROM adj a JOIN l1 l ON l.id = a.nbr
      |    GROUP BY a.id, l.label) t
      |  WHERE rn = 1)
      |SELECT label, CAST(COUNT(*) AS BIGINT) AS n
      |FROM l2 GROUP BY label
      |ORDER BY label""".stripMargin) { (spark, dir) =>
    Graph.labelPropagation(coPurchase(spark, dir), rounds = 2)
      .groupBy(col("label")).agg(count(lit(1)).as("n"))
      .orderBy(col("label"))
  }

  val all: Seq[OpQuery] = Seq(graph_triangles_oriented, graph_jaccard_links, graph_lpa)
}
