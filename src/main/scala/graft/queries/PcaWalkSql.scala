package graft.queries

/** DuckDB CTE builder for the quantized deflated-power-iteration PCA
  * walk — the SQL replay of
  * [[graft.operators.Similarity.topPrincipalComponentsMultiPass]] at
  * `quantizeDp = 9`. Extracted from `emb_pca_topr` so the component
  * walk is stated ONCE and every gate that consumes the components
  * (`emb_pca_topr`: the vectors themselves; `emb_whiten`: the
  * projections) replays the identical arithmetic: Gram passes sum
  * per-dimension contributions rounded to 9 dp in DECIMAL
  * (order-independent), and projection deflation is generated as
  * explicit left-to-right terms matching the driver's accumulation
  * order. The walk CTEs end with `comp0..comp{r-1}` (unit vector `v` +
  * `lambda`) and `res0..res{r-1}` (relative residuals), over `e`
  * (doc_id, x = embedding as DOUBLE[]) and `d` (dimension count).
  */
private[queries] object PcaWalkSql {

  def gram(name: String, vPrev: String): String =
    s"""$name AS MATERIALIZED (
       |  SELECT list(CAST(wd AS DOUBLE) ORDER BY dd) AS w FROM (
       |    SELECT dd, SUM(CAST(ROUND(x_el * s, 9) AS DECIMAL(38,9))) AS wd
       |    FROM (
       |      SELECT generate_subscripts(x, 1) AS dd, unnest(x) AS x_el,
       |             list_dot_product(x, (SELECT v FROM $vPrev)) AS s
       |      FROM e)
       |    GROUP BY dd))""".stripMargin

  // projection coefficients come from the GRAM OUTPUT w (k_k = v_k·w),
  // mirroring Similarity's projection deflation — orthogonality holds
  // by construction on both engines. The vSrc variant lets
  // [[BlockWalkSql]] project against the SAME ITERATION's normalized
  // columns (classical Gram–Schmidt) instead of finished components.
  def coefCte(name: String, c: Int, wSrc: String): String =
    coefCteFrom(name, c, wSrc, k => s"comp$k")

  def coefCteFrom(name: String, c: Int, wSrc: String,
      vSrc: Int => String): String =
    s"""$name AS MATERIALIZED (
       |  SELECT ${(0 until c).map(k =>
              s"list_dot_product(c$k.v, p.w) AS k$k").mkString(", ")}
       |  FROM ${(0 until c).map(k => s"${vSrc(k)} c$k").mkString(", ")}, $wSrc p)""".stripMargin

  def deflCte(name: String, c: Int, wSrc: String, fSrc: String): String =
    deflCteFrom(name, c, wSrc, fSrc, k => s"comp$k")

  def deflCteFrom(name: String, c: Int, wSrc: String, fSrc: String,
      vSrc: Int => String): String =
    s"""$name AS MATERIALIZED (
       |  SELECT list_transform(range(1, (SELECT n FROM d) + 1),
       |    j -> w.w[CAST(j AS INT)] - (${(0 until c).map(k =>
              s"f.k$k * c$k.v[CAST(j AS INT)]").mkString(" + ")})) AS w
       |  FROM $wSrc w, $fSrc f, ${(0 until c).map(k => s"${vSrc(k)} c$k").mkString(", ")})""".stripMargin

  def normCte(name: String, src: String): String =
    s"""$name AS MATERIALIZED (
       |  SELECT list_transform(w, y -> y / sqrt(list_dot_product(w, w))) AS v,
       |         sqrt(list_dot_product(w, w)) AS lambda
       |  FROM $src)""".stripMargin

  val base: String =
    // MAX(len), matching the Scala side's max(size): a ragged corpus
    // (one shorter row) must walk the FULL dimension count on both
    // engines or the deflation/residual CTEs truncate on one side only
    """WITH e AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings),
      |d AS MATERIALIZED (SELECT MAX(len(x)) AS n FROM e)""".stripMargin

  def perComp(r: Int, iters: Int): Seq[String] =
    perCompWith(r, iters, gram)

  /** The per-component CTE chain abstracted over the Gram-product CTE
    * builder — [[GramWalkSql]] reuses the identical probe/deflation/
    * normalization/residual structure with its G-matrix product in
    * place of the per-row corpus pass (the SQL mirror of how
    * `Similarity.deflatedPowerWalk` abstracts over `gramTimes`).
    */
  def perCompWith(r: Int, iters: Int,
      gramFn: (String, String) => String): Seq[String] = (0 until r).flatMap { c =>
    val start =
      s"""v${c}_0 AS MATERIALIZED (
         |  SELECT list_transform(range(1, (SELECT n FROM d) + 1),
         |           i -> CASE WHEN i = 1 THEN CAST(1.0 AS DOUBLE)
         |                ELSE CAST(0.0 AS DOUBLE) END) AS v)""".stripMargin
    val steps = (1 to iters).flatMap { i =>
      val g = gramFn(s"w${c}_$i", s"v${c}_${i - 1}")
      if (c == 0) Seq(g, normCte(s"v${c}_$i", s"w${c}_$i"))
      else Seq(g,
        coefCte(s"f${c}_$i", c, s"w${c}_$i"),
        deflCte(s"u${c}_$i", c, s"w${c}_$i", s"f${c}_$i"),
        normCte(s"v${c}_$i", s"u${c}_$i"))
    }
    val compC =
      s"comp$c AS MATERIALIZED (SELECT v, lambda FROM v${c}_$iters)"
    val residSrc = if (c == 0) s"wr$c" else s"wrd$c"
    val residCtes =
      if (c == 0) Seq(gramFn(s"wr$c", s"v${c}_$iters"))
      else Seq(gramFn(s"wr$c", s"v${c}_$iters"),
        coefCte(s"fr$c", c, s"wr$c"),
        deflCte(s"wrd$c", c, s"wr$c", s"fr$c"))
    val res =
      s"""res$c AS MATERIALIZED (
         |  SELECT sqrt(list_dot_product(dl, dl)) / lambda AS resid FROM (
         |    SELECT list_transform(range(1, (SELECT n FROM d) + 1),
         |             i -> s.w[CAST(i AS INT)] - vv.lambda * vv.v[CAST(i AS INT)]) AS dl,
         |           vv.lambda AS lambda
         |    FROM $residSrc s, v${c}_$iters vv))""".stripMargin
    Seq(start) ++ steps ++ Seq(compC) ++ residCtes ++ Seq(res)
  }

  /** The full WITH clause (base + every per-component CTE), ready to
    * prepend to a gate-specific final SELECT.
    */
  def walk(r: Int, iters: Int): String =
    (Seq(base) ++ perComp(r, iters)).mkString(",\n")
}
