package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Graph, SpatialJoin}

/** Round-6 batch 9: weighted shortest paths and the 2-D spatial join.
  *
  * Both gates derive their graph/geometry DETERMINISTICALLY from table
  * keys (the Round4Ops102 arithmetic-derivation idiom) so the oracle
  * reproduces the exact same structure from the same parquet, at any
  * scale factor.
  */
object Round6Ops9 {

  /** Bounded-hop Bellman-Ford over a sparse arithmetic graph: node set
    * = customer keys, two out-edges per node ((2c+1) mod M, (3c+2)
    * mod M) with small INTEGRAL weights, seeds {1,2,3}, 6 hops. The
    * oracle replays the relaxation as a recursive CTE taking MIN(d)
    * per node — out-degree 2 bounds the path expansion to ~3·2⁷ rows
    * however large the table is.
    */
  val graph_shortest_paths = OpQuery(
    "graph_shortest_paths",
    """WITH RECURSIVE m AS (
      |  SELECT COUNT(*) AS n FROM customer
      |), edges AS (
      |  SELECT c_custkey AS src, (2 * c_custkey + 1) % m.n AS dst,
      |         c_custkey % 7 + 1 AS w
      |  FROM customer, m
      |  UNION ALL
      |  SELECT c_custkey, (3 * c_custkey + 2) % m.n, c_custkey % 5 + 1
      |  FROM customer, m
      |), r(id, d, hops) AS (
      |  SELECT CAST(s AS BIGINT), CAST(0 AS BIGINT), 0
      |  FROM (SELECT unnest([1, 2, 3]) AS s)
      |  UNION ALL
      |  SELECT e.dst, r.d + e.w, r.hops + 1
      |  FROM r JOIN edges e ON e.src = r.id
      |  WHERE r.hops < 6
      |)
      |SELECT id, CAST(MIN(d) AS BIGINT) AS dist
      |FROM r GROUP BY id ORDER BY id""".stripMargin) { (spark, dir) =>
    val cust = Tables.load(spark, dir, "customer")
    val m = cust.agg(count(lit(1)).as("__n"))
    val base = cust.select(col("c_custkey").cast("long").as("c"))
      .crossJoin(broadcast(m))
    val edges = base.select(col("c").as("src"),
        ((col("c") * 2 + 1) % col("__n")).as("dst"),
        (col("c") % 7 + 1).cast("long").as("w"))
      .unionAll(base.select(col("c").as("src"),
        ((col("c") * 3 + 2) % col("__n")).as("dst"),
        (col("c") % 5 + 1).cast("long").as("w")))
    import spark.implicits._
    val seeds = Seq(1L, 2L, 3L).toDF("id")
    Graph.shortestPaths(edges, seeds, maxHops = 6)
      .select(col("id"), col("dist").cast("long").as("dist"))
      .orderBy(col("id"))
  }

  /** Grid-tile spatial join: customer-derived points against
    * supplier-derived boxes on a 1000×1000 integer-valued plane,
    * 25-unit tiles. The oracle is the exhaustive BETWEEN join — the
    * gate proves tiled ≡ exhaustive, the ground-truth relationship
    * every bucketed rewrite here is held to.
    */
  val spatial_points_in_boxes = OpQuery(
    "spatial_points_in_boxes",
    """WITH p AS (
      |  SELECT c_custkey AS point_id,
      |         CAST((c_custkey * 37) % 1000 AS DOUBLE) AS x,
      |         CAST((c_custkey * 91) % 1000 AS DOUBLE) AS y
      |  FROM customer
      |), b AS (
      |  SELECT s_suppkey AS box_id,
      |         CAST((s_suppkey * 53) % 950 AS DOUBLE) AS xlo,
      |         CAST((s_suppkey * 53) % 950 + (s_suppkey % 37) + 2 AS DOUBLE) AS xhi,
      |         CAST((s_suppkey * 67) % 950 AS DOUBLE) AS ylo,
      |         CAST((s_suppkey * 67) % 950 + (s_suppkey % 29) + 2 AS DOUBLE) AS yhi
      |  FROM supplier
      |)
      |SELECT p.point_id, b.box_id
      |FROM p JOIN b
      |  ON p.x BETWEEN b.xlo AND b.xhi
      | AND p.y BETWEEN b.ylo AND b.yhi
      |ORDER BY point_id, box_id""".stripMargin) { (spark, dir) =>
    val points = Tables.load(spark, dir, "customer").select(
      col("c_custkey").cast("long").as("point_id"),
      ((col("c_custkey") * 37) % 1000).cast("double").as("x"),
      ((col("c_custkey") * 91) % 1000).cast("double").as("y"))
    val boxes = Tables.load(spark, dir, "supplier").select(
      col("s_suppkey").cast("long").as("box_id"),
      ((col("s_suppkey") * 53) % 950).cast("double").as("xlo"),
      ((col("s_suppkey") * 53) % 950 + (col("s_suppkey") % 37) + 2)
        .cast("double").as("xhi"),
      ((col("s_suppkey") * 67) % 950).cast("double").as("ylo"),
      ((col("s_suppkey") * 67) % 950 + (col("s_suppkey") % 29) + 2)
        .cast("double").as("yhi"))
    SpatialJoin.pointsInBoxes(points, boxes, cellSize = 25.0)
      .select(col("point_id"), col("box_id"))
      .orderBy(col("point_id"), col("box_id"))
  }

  /** Distance join at radius 20 between customer- and supplier-derived
    * integral points: 3×3-neighbourhood tile join ≡ the exhaustive
    * squared-distance join. All arithmetic stays in the integer domain
    * (squared distance vs radius², no sqrt) so both engines agree
    * bit-for-bit on the boundary.
    */
  val spatial_within_radius = OpQuery(
    "spatial_within_radius",
    """WITH p AS (
      |  SELECT c_custkey AS point_id,
      |         (c_custkey * 37) % 1000 AS x, (c_custkey * 91) % 1000 AS y
      |  FROM customer
      |), q AS (
      |  SELECT s_suppkey AS station_id,
      |         (s_suppkey * 53) % 1000 AS x2, (s_suppkey * 67) % 1000 AS y2
      |  FROM supplier
      |)
      |SELECT p.point_id, q.station_id,
      |       CAST((p.x - q.x2) * (p.x - q.x2) + (p.y - q.y2) * (p.y - q.y2) AS BIGINT) AS d2
      |FROM p JOIN q
      |  ON (p.x - q.x2) * (p.x - q.x2) + (p.y - q.y2) * (p.y - q.y2) <= 400
      |ORDER BY point_id, station_id""".stripMargin) { (spark, dir) =>
    val pts = Tables.load(spark, dir, "customer").select(
      col("c_custkey").cast("long").as("point_id"),
      ((col("c_custkey") * 37) % 1000).cast("long").as("x"),
      ((col("c_custkey") * 91) % 1000).cast("long").as("y"))
    val stations = Tables.load(spark, dir, "supplier").select(
      col("s_suppkey").cast("long").as("station_id"),
      ((col("s_suppkey") * 53) % 1000).cast("long").as("x2"),
      ((col("s_suppkey") * 67) % 1000).cast("long").as("y2"))
    SpatialJoin.pointsWithinRadius(pts, stations, radius = 20.0)
      .select(col("point_id"), col("station_id"),
        ((col("x") - col("x2")) * (col("x") - col("x2")) +
          (col("y") - col("y2")) * (col("y") - col("y2"))).cast("long").as("d2"))
      .orderBy(col("point_id"), col("station_id"))
  }

  val all: Seq[OpQuery] = Seq(
    graph_shortest_paths, spatial_points_in_boxes, spatial_within_radius)
}
