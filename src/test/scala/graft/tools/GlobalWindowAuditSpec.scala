package graft.tools

import graft.SparkSpec

/** The structural replacement for WindowExec's "No Partition Defined"
  * WARN (quieted in GraftSession — see the rationale there): every
  * registry gate's analyzed plan is scanned for unpartitioned Windows,
  * and each one must sit over a provably reduced frame (Aggregate /
  * Distinct / Limit / small local relation on EVERY leaf path, CTEs
  * resolved). A RAW finding — a global window fed table-sized data —
  * fails this spec, which is a stronger guard than a log line in a
  * 587-gate bench tail: round 9's run of exactly this audit found and
  * led to rewrites of seven genuinely table-sized global windows
  * (eval_auc, ml_delong_auc, eval_brier_decomp, a72_weibull_fit,
  * a86_kruskal_wallis, ml_tree_stump, priv_t_closeness) onto
  * TotalOrder's distributed range-shuffle forms.
  *
  * Runs on a representative slice per suite execution (the FULL
  * registry is the GlobalWindowScan main, run per round): the slice
  * pins the seven round-9 rewrites plus the families that historically
  * carried global windows.
  */
class GlobalWindowAuditSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private val pinned = Seq(
    // the seven round-9 RAW rewrites — must stay clean
    "eval_auc", "ml_delong_auc", "eval_brier_decomp", "a72_weibull_fit",
    "a86_kruskal_wallis", "ml_tree_stump", "priv_t_closeness",
    // historically window-heavy families
    "a75_mann_whitney", "stat_wilcoxon_signed_rank", "stat_bh_fdr",
    "ts_theil_sen", "ts_changepoint", "fin_var_es", "eval_f1_multi",
    "a48_bootstrap_ci", "a50_survival_km", "dq_id_gaps", "text_zipf",
    "w13_range_frame", "a54_hl_approx", "a54_hodges_lehmann",
    "w1_row_number", "w2_top1_per_group", "w3_share_of_total")

  test("no gate feeds table-sized data into an unpartitioned window") {
    val missing = pinned.filterNot(graft.SparkEntry.queries.contains)
    assert(missing.isEmpty, s"audit list names unknown gates: $missing")
    val raw = pinned.flatMap { name =>
      GlobalWindowScan.scanGate(spark, sfDir, name).filterNot(_.bounded)
    }
    assert(raw.isEmpty,
      "RAW global windows (table-sized single-reducer funnels): " +
        raw.map(h => s"${h.gate}[${h.cols}]").mkString(", "))
  }
}
