package graft.queries

/** DuckDB CTE builder for the quantized BLOCK power iteration — the SQL
  * replay of [[graft.operators.Similarity.topPrincipalComponentsBlock]]
  * at `quantizeDp = 9` (VERDICT r9 item 2). Per iteration, every
  * component k gets its own Gram CTE (`w{k}_i`, reusing
  * [[PcaWalkSql.gram]]'s per-row 9dp-decimal pass verbatim — in the
  * Spark operator all r of these come from ONE distributed scan; SQL
  * states them separately but the arithmetic per component is
  * identical), then classical Gram–Schmidt against the SAME iteration's
  * already-normalized earlier columns via [[PcaWalkSql.coefCteFrom]] /
  * [[PcaWalkSql.deflCteFrom]], then normalization. After the last
  * iteration a final per-component Gram pass yields the Rayleigh
  * eigenvalue λ_k = v_k·w and the FULL-operator residual — matching the
  * operator's final-pass semantics exactly. Ends with
  * `comp0..comp{r-1}` (v, lambda) and `res0..res{r-1}`, over
  * [[PcaWalkSql.base]]'s `e`/`d`. No restart branch: data whose leading
  * dimensions are identically zero is outside the gate regime (the
  * OPERATOR restarts dead columns; the replay would NULL out) — the
  * standard caveat of every quantized-walk oracle in this suite.
  */
private[queries] object BlockWalkSql {

  def perIterations(r: Int, iters: Int): Seq[String] = {
    val starts = (0 until r).map { k =>
      s"""v${k}_0 AS MATERIALIZED (
         |  SELECT list_transform(range(1, (SELECT n FROM d) + 1),
         |           i -> CASE WHEN i = ${k + 1} THEN CAST(1.0 AS DOUBLE)
         |                ELSE CAST(0.0 AS DOUBLE) END) AS v)""".stripMargin
    }
    val steps = (1 to iters).flatMap { i =>
      (0 until r).flatMap { k =>
        val g = PcaWalkSql.gram(s"w${k}_$i", s"v${k}_${i - 1}")
        if (k == 0) Seq(g, PcaWalkSql.normCte(s"v${k}_$i", s"w${k}_$i"))
        else Seq(g,
          PcaWalkSql.coefCteFrom(s"f${k}_$i", k, s"w${k}_$i", j => s"v${j}_$i"),
          PcaWalkSql.deflCteFrom(s"u${k}_$i", k, s"w${k}_$i", s"f${k}_$i",
            j => s"v${j}_$i"),
          PcaWalkSql.normCte(s"v${k}_$i", s"u${k}_$i"))
      }
    }
    // final pass: Rayleigh λ and full-operator residual per component
    val finals = (0 until r).flatMap { k =>
      Seq(
        PcaWalkSql.gram(s"wf$k", s"v${k}_$iters"),
        s"""comp$k AS MATERIALIZED (
           |  SELECT vv.v AS v,
           |         list_dot_product(vv.v, wf.w) AS lambda
           |  FROM v${k}_$iters vv, wf$k wf)""".stripMargin,
        s"""res$k AS MATERIALIZED (
           |  SELECT sqrt(list_dot_product(dl, dl)) / lambda AS resid FROM (
           |    SELECT list_transform(range(1, (SELECT n FROM d) + 1),
           |             i -> wf.w[CAST(i AS INT)]
           |                  - c.lambda * c.v[CAST(i AS INT)]) AS dl,
           |           c.lambda AS lambda
           |    FROM wf$k wf, comp$k c))""".stripMargin)
    }
    starts ++ steps ++ finals
  }

  /** The full WITH clause over [[PcaWalkSql.base]]'s corpus CTEs. */
  def walk(r: Int, iters: Int): String =
    (Seq(PcaWalkSql.base) ++ perIterations(r, iters)).mkString(",\n")
}
