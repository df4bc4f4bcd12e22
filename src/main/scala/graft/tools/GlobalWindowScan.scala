package graft.tools

import org.apache.spark.sql.catalyst.plans.logical._

/** Static audit for VERDICT r8 item 6 — the structural replacement for
  * WindowExec's "No Partition Defined" WARN. For every registry gate,
  * walk the ANALYZED plan (subqueries included) and classify each
  * Window with an EMPTY partition spec:
  *
  *   - `post-agg` — EVERY leaf under the window passes through an
  *     Aggregate / Distinct / Limit / one-row LocalRelation before
  *     reaching it, so the frame is a reduction (day spine, distinct
  *     p-values, per-group summaries), cardinality-bounded by
  *     construction. Single-partition execution is correct and
  *     intended there.
  *   - `RAW` — some leaf reaches the window un-aggregated: the window
  *     funnels table-sized data through one reducer. That is the
  *     scale bug the WARN exists to catch, reported as a failure.
  *
  * This is STRONGER than the log line: a raw global window fails the
  * audit (GlobalWindowAuditSpec pins zero) instead of scrolling past
  * in a 587-gate bench log. The runtime WARN is silenced in
  * [[graft.GraftSession]] — a constant `PARTITION BY` would silence it
  * too, but the optimizer folds constant partition keys away before
  * the physical plan, so the declaration cannot survive to WindowExec;
  * the analyzed-plan audit is where the claim is checkable.
  *
  * Usage: runMain graft.tools.GlobalWindowScan [sfDir] [gates-csv]
  * Prints one line per gate with findings; exits 1 if any RAW.
  */
object GlobalWindowScan {

  /** True when every path from `plan` down to a leaf crosses a
    * row-reducing operator before the leaf: the window's input is a
    * reduction of base data, not base data itself. CTE references
    * resolve to their definitions (analyzed plans keep `WithCTE`, so a
    * spine aggregated in a CTE must not read as a raw leaf).
    */
  private def boundedInput(plan: LogicalPlan,
      ctes: Map[Long, LogicalPlan]): Boolean = plan match {
    case _: Aggregate => true
    case _: Distinct => true
    case _: Deduplicate => true
    // a LIMIT bounds the frame only when the limit itself is small —
    // limit(2e9) through one reducer is exactly the funnel this audit
    // exists to catch, so an unfoldable/large limit reads as raw
    case g: GlobalLimit => g.maxRows.exists(_ <= 100000)
    case l: LocalRelation => l.data.lengthCompare(1000) <= 0
    case _: OneRowRelation => true
    case r: Range => r.numElements.isValidInt && r.numElements.toInt <= 100000
    case ref: CTERelationRef =>
      ctes.get(ref.cteId).exists(boundedInput(_, ctes))
    case leaf: LeafNode => false
    case other =>
      other.children.nonEmpty && other.children.forall(boundedInput(_, ctes))
  }

  final case class Hit(gate: String, cols: String, bounded: Boolean)

  def scanGate(spark: org.apache.spark.sql.SparkSession, sfDir: String,
      name: String): Seq[Hit] = {
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    val analyzed = df.queryExecution.analyzed
    val ctes: Map[Long, LogicalPlan] = analyzed.collectWithSubqueries {
      case w: WithCTE => w.cteDefs.map(d => d.id -> d.child)
    }.flatten.toMap
    analyzed.collectWithSubqueries {
      case w: Window if w.partitionSpec.isEmpty =>
        Hit(name, w.windowExpressions.map(_.name).mkString("+"),
          boundedInput(w.child, ctes))
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val gates =
      if (args.length > 1) args(1).split(",").toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val spark = graft.GraftSession.local("graft-window-scan")
    spark.sparkContext.setLogLevel("ERROR")
    var raw = 0
    var bounded = 0
    var errors = 0
    gates.foreach { name =>
      try {
        val hits = scanGate(spark, sfDir, name)
        val (ok, bad) = hits.partition(_.bounded)
        bounded += ok.size
        raw += bad.size
        if (bad.nonEmpty)
          println(s"[winscan] $name: RAW global window(s): " +
            bad.map(_.cols).mkString("; "))
        else if (ok.nonEmpty)
          println(s"[winscan] $name: ${ok.size} post-agg bounded global window(s): " +
            ok.map(_.cols).mkString("; "))
      } catch {
        case e: Throwable =>
          // an unscannable gate is a FAILURE, not a skip — a gate that
          // never analyzed could hide the exact funnel this audit
          // exists to catch, so the "zero RAW" claim must not be
          // issued over it
          errors += 1
          println(s"[winscan] $name: SCAN ERROR ${e.getClass.getSimpleName}: " +
            s"${Option(e.getMessage).getOrElse("").take(120)}")
      }
    }
    println(s"[winscan] ${gates.size} gates scanned: " +
      s"$bounded bounded global windows, $raw RAW, $errors scan errors")
    spark.stop()
    if (raw > 0 || errors > 0) sys.exit(1)
  }
}
