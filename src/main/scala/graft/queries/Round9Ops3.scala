package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Similarity

/** Round-9 batch 3: the one-pass Gram matrix — the 100 TB scan-count
  * fix for the PCA family. The deflated power walk reads the corpus
  * r·iterations times (36 scans for the top-3 gate shape);
  * [[Similarity.gramMatrixOnePass]] reads it ONCE, accumulating the
  * d(d+1)/2 upper triangle per partition and reducing the ≤ partitions
  * summaries pairwise. This gate pins the accumulation EXACTLY:
  * integer-quantized inputs make every product and partial sum an exact
  * integer below 2⁵³, so the one-pass result must equal the declarative
  * explode-join form bit-for-bit (in-gate REQUIRE) and hash-replay
  * against DuckDB's pair aggregation. The walk driven off G is pinned
  * against the multi-pass walk in PcaToprSpec.
  */
object Round9Ops3 {

  /** One-pass Gram vs the declarative pair-join, both over 2dp-quantized
    * embeddings (|q| ≤ ~few hundred, so G entries stay far below 2⁵³ and
    * the accumulation is order-independent exact integer math on BOTH
    * engines). Output is the one-pass operator's matrix as (j, k, g)
    * rows; the oracle recomputes it as DuckDB's exploded self-join.
    */
  val emb_gram_onepass: OpQuery = OpQuery(
    "emb_gram_onepass",
    """WITH e AS MATERIALIZED (
      |  SELECT vec_id,
      |         list_transform(embedding::DOUBLE[],
      |                        y -> CAST(ROUND(y * 100, 0) AS BIGINT)) AS q
      |  FROM embeddings),
      |x AS MATERIALIZED (
      |  SELECT vec_id, generate_subscripts(q, 1) AS j, unnest(q) AS xj
      |  FROM e)
      |SELECT CAST(a.j - 1 AS INT) AS j, CAST(b.j - 1 AS INT) AS k,
      |       CAST(SUM(a.xj * b.xj) AS BIGINT) AS g
      |FROM x a JOIN x b USING (vec_id)
      |GROUP BY 1, 2
      |ORDER BY j, k""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val quantized = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding").cast("array<double>"),
          y => round(y * 100, 0)).as("qv"))
    // the one-pass operator under test (exact integer sums in double)
    val (g1, nRows) = Similarity.gramMatrixOnePass(quantized, "qv")
    require(nRows > 0, "embeddings table is empty")
    val dim = g1.length
    // exactness twin: the declarative explode-join form — the shape the
    // oracle replays. Deliberately quadratic in d (n·d² joined rows);
    // at scale only the one-pass operator runs, this form exists to
    // prove it exact.
    val xr = quantized
      .select(col("vec_id"),
        posexplode(col("qv")).as(Seq("j", "xj")))
    val g2 = xr.as("a").join(xr.as("b"), "vec_id")
      .groupBy(col("a.j").as("j"), col("b.j").as("k"))
      .agg(sum(col("a.xj") * col("b.xj")).cast("long").as("g"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2))
      .toMap
    require(g2.size == dim * dim,
      s"declarative Gram has ${g2.size} entries, one-pass dim $dim")
    for (j <- 0 until dim; k <- 0 until dim) {
      val onePass = g1(j)(k)
      require(onePass == onePass.toLong.toDouble &&
          onePass.toLong == g2((j, k)),
        s"one-pass G($j,$k)=$onePass != declarative ${g2((j, k))}")
    }
    // output the ONE-PASS matrix — the oracle compares the operator
    // under test, not the twin (d² = 4096 rows, bounded by construction)
    val rows = for (j <- 0 until dim; k <- 0 until dim)
      yield (j, k, g1(j)(k).toLong)
    rows.toDF("j", "k", "g")
      .select(col("j").cast("int"), col("k").cast("int"), col("g"))
      .orderBy("j", "k")
  }

  val all: Seq[OpQuery] = Seq(emb_gram_onepass)
}
