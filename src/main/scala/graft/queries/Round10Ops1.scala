package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Round-10 batch 1: block power iteration — the wide-vector PCA path
  * (VERDICT r9 item 2). Past [[graft.operators.Similarity.GramEnvelopeDim]]
  * the one-scan Gram triangle no longer fits task memory, and the only
  * prior path was sequential deflation at r·iterations corpus scans;
  * the block walk gets ALL r components in `iterations` scans — an r×
  * scan reduction exactly where scans are most expensive.
  */
object Round10Ops1 {

  /** Top-3 components by quantized block power iteration, hash-replayed
    * end-to-end: [[BlockWalkSql]] regenerates every pass (per-row
    * contributions rounded to 9dp and summed in DECIMAL —
    * order-independent), the classical Gram–Schmidt
    * re-orthonormalization (coefficients from the Gram output against
    * the same iteration's earlier columns; ≤ 2 IEEE addends per
    * per-dimension correction at r = 3), and the final-pass Rayleigh
    * eigenvalues / full-operator residuals. The gate runs the RAW
    * embeddings (the same regime as `emb_pca_quantized`): each
    * contribution is one IEEE multiply, bit-identical in any engine,
    * so the 8-iteration fixpoint replays exactly. Block≡deflation
    * component parity and the iterations-not-r·iterations scan count
    * are PcaBlockSpec territory.
    */
  val emb_pca_block: OpQuery = {
    val iters = 8
    val r = 3
    val finals = (0 until r).map { c =>
      s"""SELECT CAST($c AS INT) AS comp_idx, CAST(g.i - 1 AS INT) AS dim,
         |       CAST(ROUND(cc.v[CAST(g.i AS INT)], 6) AS DOUBLE) AS component,
         |       CAST(ROUND(cc.lambda, 3) AS DOUBLE) AS eigenvalue,
         |       (SELECT resid FROM res$c) < 0.1 AS converged
         |FROM comp$c cc,
         |     (SELECT unnest(range(1, (SELECT n FROM d) + 1)) AS i) g""".stripMargin
    }.mkString("\nUNION ALL\n")
    val sql = BlockWalkSql.walk(r, iters) +
      "\n" + finals + "\nORDER BY comp_idx, dim"
    OpQuery("emb_pca_block", sql) { (spark, dir) =>
      val emb = Tables.load(spark, dir, "embeddings")
      val comps = graft.operators.Similarity.topPrincipalComponentsBlock(
        emb, "embedding", r = r, iterations = iters, quantizeDp = 9)
      import spark.implicits._
      comps.zipWithIndex.flatMap { case ((lambda, v, resid), c) =>
        v.zipWithIndex.map { case (x, dimIdx) =>
          (c, dimIdx, x, lambda, resid < 0.1)
        }
      }.toDF("comp_idx", "dim", "component", "eigenvalue", "converged")
        .select(
          col("comp_idx").cast("int").as("comp_idx"),
          col("dim").cast("int").as("dim"),
          round(col("component"), 6).as("component"),
          round(col("eigenvalue"), 3).as("eigenvalue"),
          col("converged"))
        .orderBy("comp_idx", "dim")
    }
  }

  val all: Seq[OpQuery] = Seq(emb_pca_block)
}
