package graft.queries

import graft.Tables

/** Round-12 randomized cross-engine fuzz gate (VERDICT r11 item 6): the
  * registry's 619 gates are FIXED shapes, so a semantics drift in a
  * corner none of them exercises (an OR-of-moduli filter over a join, a
  * HAVING over a string group key, MIN of a negative CASE arm) would
  * ship silently. This gate generates `NShapes` random relational
  * queries — projection / filter / equi-join / group-agg / HAVING over
  * the sf tables — from ONE seeded AST, renders each to BOTH dialects,
  * and hash-compares an order-independent per-shape digest (row-count +
  * md5-derived checksum) between Spark and DuckDB in the ordinary
  * oracle machinery.
  *
  * Determinism: a fixed splitmix64 walk from [[Seed]] (surfaced in the
  * output as shape_id = -1, so a mismatch report names the generation
  * recipe); generation is pure string-building, identical every
  * compile. The grammar deliberately stays inside the engines' COMMON
  * semantics surface: integer and string columns only (doubles sum
  * order-dependently; timestamps render differently), arithmetic on
  * BIGINT-cast operands (Spark runs ANSI-on here, so an INT overflow
  * would throw rather than wrap), and digests through
  * `md5 → first-8-hex → BIGINT`, which both engines compute exactly
  * (`conv(...,16,10)` / `('0x' || ...)::BIGINT` — the a69_hll_md5
  * recipe).
  */
object Round12Fuzz {

  val Seed = 0x12fe5eedL
  val NShapes = 120

  /** splitmix64 — fixed, engine-independent walk. */
  private final class Rng(seed: Long) {
    private var s = seed
    def nextLong(): Long = {
      s += 0x9E3779B97F4A7C15L
      var z = s
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    def nextInt(n: Int): Int = (((nextLong() % n) + n) % n).toInt
    def pick[A](xs: Seq[A]): A = xs(nextInt(xs.size))
    def chance(pct: Int): Boolean = nextInt(100) < pct
  }

  private final case class Tbl(name: String, ints: Seq[String], strs: Seq[String])
  private val tbls = Seq(
    Tbl("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"),
      Seq("l_returnflag", "l_linestatus")),
    Tbl("orders", Seq("o_orderkey", "o_custkey"),
      Seq("o_orderstatus", "o_orderpriority")),
    Tbl("customer", Seq("c_custkey", "c_nationkey"), Seq("c_mktsegment", "c_name")),
    Tbl("supplier", Seq("s_suppkey", "s_nationkey"), Seq("s_name")),
    Tbl("part", Seq("p_partkey", "p_size"), Seq("p_brand", "p_type")),
    Tbl("nation", Seq("n_nationkey", "n_regionkey"), Seq("n_name")),
    Tbl("region", Seq("r_regionkey"), Seq("r_name")),
    Tbl("events", Seq("event_id", "user_id"), Seq("event_type")),
    Tbl("documents", Seq("doc_id", "n_chars"), Seq("lang", "source")))
  private def tbl(n: String): Tbl = tbls.find(_.name == n).get
  // real FK edges only — a random equi-join would mostly produce empty
  // (trivially matching) digests
  private val fks: Map[String, Seq[(String, String, String)]] = Map(
    "lineitem" -> Seq(("l_orderkey", "orders", "o_orderkey"),
      ("l_partkey", "part", "p_partkey"), ("l_suppkey", "supplier", "s_suppkey")),
    "orders" -> Seq(("o_custkey", "customer", "c_custkey")),
    "customer" -> Seq(("c_nationkey", "nation", "n_nationkey")),
    "supplier" -> Seq(("s_nationkey", "nation", "n_nationkey")),
    "nation" -> Seq(("n_regionkey", "region", "r_regionkey")))

  /** One generated shape: the table names left abstract so the same AST
    * renders against DuckDB's bare parquet views and the gate's
    * collision-safe `fz_`-prefixed Spark temp views.
    */
  private final case class Shape(table: String, joined: Option[String], inner: String)

  private def genShape(r: Rng): Shape = {
    val t = r.pick(tbls)
    val fk = if (fks.contains(t.name) && r.chance(45)) Some(r.pick(fks(t.name))) else None
    val intCols = t.ints.map("a." + _) ++
      fk.toSeq.flatMap { case (_, jt, _) => tbl(jt).ints.map("b." + _) }
    val strCols = t.strs.map("a." + _) ++
      fk.toSeq.flatMap { case (_, jt, _) => tbl(jt).strs.map("b." + _) }
    def big(c: String) = s"CAST($c AS BIGINT)"
    def intExpr(): String = r.nextInt(5) match {
      case 0 => r.pick(intCols)
      case 1 => s"(${big(r.pick(intCols))} % ${2 + r.nextInt(97)})"
      case 2 => s"(${big(r.pick(intCols))} + ${big(r.pick(intCols))})"
      case 3 =>
        s"(CASE WHEN ${big(r.pick(intCols))} % ${2 + r.nextInt(7)} = ${r.nextInt(2)} " +
          s"THEN ${big(r.pick(intCols))} ELSE ${big(r.pick(intCols))} END)"
      case 4 => s"LENGTH(${r.pick(strCols)})"
    }
    def atomicPred(): String = r.nextInt(5) match {
      case 0 =>
        s"${r.pick(intCols)} ${r.pick(Seq("<", "<=", ">", ">=", "=", "<>"))} ${r.nextInt(5000)}"
      case 1 => s"${big(r.pick(intCols))} % ${2 + r.nextInt(13)} = ${r.nextInt(5)}"
      case 2 =>
        s"${r.pick(intCols)} IN (${Seq.fill(3)(r.nextInt(3000)).mkString(", ")})"
      case 3 => s"${r.pick(strCols)} LIKE '${('A' + r.nextInt(26)).toChar}%'"
      case 4 =>
        s"${r.pick(strCols)} ${if (r.chance(50)) ">=" else "<"} '${('A' + r.nextInt(26)).toChar}'"
    }
    val where = (1 to 1 + r.nextInt(3)).map(_ => atomicPred())
      .mkString(if (r.chance(60)) " AND " else " OR ")
    val from = "FROM {" + t.name + "} a" + fk.fold("") { case (l, jt, rk) =>
      s" JOIN {$jt} b ON a.$l = b.$rk"
    }
    def aggList(): Seq[String] = {
      val pool = Seq(
        () => "COUNT(*)",
        () => s"SUM(${big(intExpr())})",
        () => s"MIN(${r.pick(intCols)})",
        () => s"MAX(${r.pick(intCols)})",
        () => s"MIN(${r.pick(strCols)})",
        () => s"COUNT(DISTINCT ${r.pick(intCols ++ strCols)})")
      (1 to 1 + r.nextInt(3)).map(k => s"${pool(r.nextInt(pool.size))()} AS v$k")
    }
    val inner = r.nextInt(6) match {
      case 0 => // plain projection digest
        val cols = (1 to 1 + r.nextInt(3)).map(k => s"${intExpr()} AS v$k")
        s"SELECT ${cols.mkString(", ")} $from WHERE $where"
      case 1 => // grouped aggregate (positional GROUP BY — both dialects)
        val gkey =
          if (r.chance(50)) r.pick(strCols)
          else s"(${big(r.pick(intCols))} % ${2 + r.nextInt(23)})"
        val having = if (r.chance(30)) s" HAVING COUNT(*) > ${r.nextInt(5)}" else ""
        s"SELECT $gkey AS g, ${aggList().mkString(", ")} $from WHERE $where GROUP BY 1$having"
      case 2 => // global aggregate
        s"SELECT ${aggList().mkString(", ")} $from WHERE $where"
      case 3 =>
        // window family (§2.5 surface): ROW_NUMBER / running SUM / LAG
        // over ONE window spec whose ORDER BY is made TOTAL by
        // appending the base table's full int-column list (every table
        // carries a unique key inside it, and FK joins are N:1 so the
        // left key stays unique through the join) — with a total
        // order, the default RANGE frame equals ROWS and every
        // engine's tie-break question vanishes
        val pexpr =
          if (r.chance(50)) r.pick(strCols)
          else s"(${big(r.pick(intCols))} % ${2 + r.nextInt(11)})"
        val total = (Seq(r.pick(intCols)) ++ t.ints.map("a." + _))
          .distinct.mkString(", ")
        val x = big(r.pick(intCols))
        val w = s"(PARTITION BY $pexpr ORDER BY $total)"
        s"SELECT ROW_NUMBER() OVER $w AS v1, SUM($x) OVER $w AS v2, " +
          s"LAG($x, 1) OVER $w AS v3 $from WHERE $where"
      case 4 =>
        // set operations between two filtered projections of the same
        // relation — UNION/INTERSECT/EXCEPT are the DISTINCT variants
        // in both engines, so the result SET is well-defined; single
        // line, so the wrapper's \n-delimited UNION ALL stays unique
        val op = r.pick(Seq("UNION ALL", "UNION", "INTERSECT", "EXCEPT"))
        val c = intExpr()
        val where2 = (1 to 1 + r.nextInt(2)).map(_ => atomicPred())
          .mkString(if (r.chance(60)) " AND " else " OR ")
        s"SELECT $c AS v1 $from WHERE $where $op SELECT $c AS v1 $from WHERE $where2"
      case 5 =>
        // top-k: ORDER BY made total (unique key in the int-column
        // suffix) so LIMIT keeps a well-defined row set in both engines
        val k = 5 + r.nextInt(95)
        val dir = if (r.chance(50)) "ASC" else "DESC"
        val total = (Seq(s"${r.pick(intCols)} $dir") ++
          t.ints.map(c => s"a.$c $dir")).distinct.mkString(", ")
        s"SELECT ${intExpr()} AS v1, ${intExpr()} AS v2 $from WHERE $where " +
          s"ORDER BY $total LIMIT $k"
    }
    Shape(t.name, fk.map(_._2), inner)
  }

  private val shapes: Seq[Shape] = {
    val r = new Rng(Seed)
    (1 to NShapes).map(_ => genShape(r))
  }

  /** Digest wrapper around one shape, dialect-parameterized: `hex8` maps
    * "first 8 md5 hex chars of <expr>" to a BIGINT in each engine. The
    * per-row string canonicalizes every output column through
    * `COALESCE(CAST(... AS VARCHAR(64)), '~')` — integers and ASCII
    * strings render identically in both engines, NULL gets a sentinel,
    * and SUM of the per-row hashes is order-independent.
    */
  private def wrap(i: Int, s: Shape, hex8: String => String,
      name: String => String, strType: String): String = {
    // column aliases the inner SELECT exposes: v1..vk (+ g for grouped)
    val aliases = ("\\bAS (v\\d+|g)\\b".r.findAllMatchIn(
      s.inner.takeWhile(_ != 'F'))).map(_.group(1)).toSeq.distinct
    val rowStr = s"concat_ws('|', ${aliases.map(a =>
      s"COALESCE(CAST($a AS $strType), '~')").mkString(", ")})"
    val inner = s.inner.replace("{" + s.table + "}", name(s.table))
    val inner2 = s.joined.fold(inner)(j => inner.replace("{" + j + "}", name(j)))
    // outer CAST: DuckDB's SUM(BIGINT) widens to HUGEINT (float64 via
    // pandas); both engines land on BIGINT explicitly
    s"""SELECT $i AS shape_id, CAST(COUNT(*) AS BIGINT) AS n_rows,
       |       CAST(COALESCE(SUM(${hex8(rowStr)}), 0) AS BIGINT) AS digest
       |FROM ($inner2) q$i""".stripMargin
  }

  private def render(hex8: String => String, name: String => String,
      strType: String): String = {
    val seedRow =
      s"SELECT -1 AS shape_id, CAST($NShapes AS BIGINT) AS n_rows, CAST($Seed AS BIGINT) AS digest"
    (seedRow +: shapes.zipWithIndex.map { case (s, i) =>
      wrap(i, s, hex8, name, strType) })
      .mkString("", "\nUNION ALL\n", "\nORDER BY shape_id")
  }

  // STRING vs VARCHAR: Spark's ANSI session logs a char/varchar WARN
  // per VARCHAR cast (and treats it as string anyway); DuckDB has no
  // STRING type — so the canonicalizing cast is dialect-split too
  private val duckSql = render(
    e => s"(('0x' || substr(md5($e), 1, 8))::BIGINT)", identity, "VARCHAR")
  private val sparkSql = render(
    e => s"CAST(conv(substr(md5($e), 1, 8), 16, 10) AS BIGINT)", "fz_" + _,
    "STRING")

  val fuzz_relational: OpQuery = OpQuery("fuzz_relational", duckSql) {
    (spark, dir) =>
      val needed = shapes.flatMap(s => s.table +: s.joined.toSeq).distinct
      needed.foreach(t =>
        Tables.load(spark, dir, t).createOrReplaceTempView("fz_" + t))
      spark.sql(sparkSql)
  }

  val all: Seq[OpQuery] = Seq(fuzz_relational)
}
