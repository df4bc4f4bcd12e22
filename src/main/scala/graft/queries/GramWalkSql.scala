package graft.queries

/** DuckDB CTE builder for the quantized deflated walk driven off the
  * ONE-PASS Gram matrix — the SQL replay of
  * [[graft.operators.Similarity.topPrincipalComponentsGram]] at
  * `quantizeDp = 9` over 1dp-integer-quantized embeddings (the
  * `emb_pca_gram_quantized` recipe, extended to r deflated components).
  * This is the oracle the DEFAULT PCA entry point now answers to
  * (VERDICT r9 item 1): `emb_pca_topr` and `emb_whiten` route through
  * the width dispatcher, which at d = 64 runs the one-scan Gram path —
  * so the gates pin the production recipe, not the 36-scan walk.
  *
  * Arithmetic parity chain: 1dp input quantization makes every Gram
  * entry an exact BIGINT on both engines (products and partial sums far
  * below 2⁵³, order-independent); each walk step's contribution
  * `G_jk · v_k` is ONE IEEE multiply of that exact integer by the
  * current iterate (bit-identical in any engine), rounded to 9dp and
  * summed in exact DECIMAL (order-free); deflation/normalization reuse
  * [[PcaWalkSql]]'s CTEs verbatim — coefficients from the Gram OUTPUT,
  * per-dimension projection sums at ≤ 2 addends for r ≤ 3 (IEEE
  * commutative). Magnitude headroom: |q| ≤ ~40 and ‖v‖ = 1 bound each
  * contribution by n·40² (8e5 at sf0.01, 8e6 at sf0.1), so the 9dp
  * rounding's ×1e9 scaling stays below 2⁵³.
  *
  * CTEs end with `comp0..comp{r-1}` / `res0..res{r-1}` over
  * `e` (vec_id, x = raw DOUBLE[], q = 1dp-quantized BIGINT[]),
  * `gm` (the pair-joined exact Gram) and `d` (dimension count).
  */
private[queries] object GramWalkSql {

  /** One walk step: w = G·v with per-entry 9dp-quantized contributions
    * — the G-matrix mirror of [[PcaWalkSql.gram]]'s per-row corpus pass.
    */
  def gram(name: String, vPrev: String): String =
    s"""$name AS MATERIALIZED (
       |  SELECT list(CAST(wd AS DOUBLE) ORDER BY j) AS w FROM (
       |    SELECT j,
       |           SUM(CAST(ROUND(g * (SELECT v FROM $vPrev)[k], 9)
       |             AS DECIMAL(38,9))) AS wd
       |    FROM gm GROUP BY j))""".stripMargin

  /** e carries BOTH the raw vector (x — projection consumers like
    * emb_whiten) and the 1dp-quantized one (q — the Gram build). d from
    * MAX(len(q)), matching the Scala side's max(size) dimension probe
    * on a ragged corpus.
    */
  val base: String =
    """WITH e AS MATERIALIZED (
      |  SELECT vec_id, embedding::DOUBLE[] AS x,
      |         list_transform(embedding::DOUBLE[],
      |                        y -> CAST(ROUND(y * 10, 0) AS BIGINT)) AS q
      |  FROM embeddings),
      |xq AS MATERIALIZED (
      |  SELECT vec_id, generate_subscripts(q, 1) AS j, unnest(q) AS xj
      |  FROM e),
      |gm AS MATERIALIZED (
      |  SELECT a.j AS j, b.j AS k, SUM(a.xj * b.xj) AS g
      |  FROM xq a JOIN xq b USING (vec_id) GROUP BY 1, 2),
      |d AS MATERIALIZED (SELECT MAX(len(q)) AS n FROM e)""".stripMargin

  /** The full WITH clause: Gram base + the r-component deflated walk
    * (PcaWalkSql's probe/deflation/normalization/residual structure
    * with this object's G-product step).
    */
  def walk(r: Int, iters: Int): String =
    (Seq(base) ++ PcaWalkSql.perCompWith(r, iters, gram)).mkString(",\n")
}
