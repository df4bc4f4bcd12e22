package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Pins the fuzz generator's determinism and dialect hygiene — the gate
  * itself is hash-compared by the driver; these are the properties a
  * fixture-free unit test can hold.
  */
class FuzzSpec extends AnyFunSuite {

  private val oracle = Round12Fuzz.fuzz_relational.oracle.get

  test("generation is deterministic: the oracle embeds the seed row and N shapes") {
    assert(oracle.contains(s"CAST(${Round12Fuzz.Seed} AS BIGINT) AS digest"))
    // one newline-delimited UNION ALL separator per shape (the seed row
    // + NShapes branches); set-op SHAPES carry their own inline
    // "UNION ALL" on a single line, so only the \n-framed form counts
    assert("\nUNION ALL\n".r.findAllIn(oracle).size === Round12Fuzz.NShapes)
  }

  test("every shape digests at least one aliased column") {
    // a wrap() whose alias extraction came up empty would render
    // concat_ws('|', ) — a syntax error caught only at gate runtime
    assert(!oracle.contains("concat_ws('|', )"))
  }

  test("the common-dialect grammar stays off the engines' divergent surface") {
    // doubles sum order-dependently; timestamps render differently —
    // no generated shape may touch those columns
    for (c <- Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "o_totalprice", "c_acctbal", "s_acctbal", "p_retailprice",
        "l_shipdate", "o_orderdate", "\"value\"", " ts ", "props"))
      assert(!oracle.contains(c), s"divergent-type column $c leaked into a shape")
  }

  test("the oracle rendering carries no spark-side view prefix") {
    // the gate reads fz_-prefixed temp views; DuckDB reads the bare
    // parquet tables — a prefix leaking into the oracle would 404
    assert(!oracle.contains("fz_"))
  }
}
