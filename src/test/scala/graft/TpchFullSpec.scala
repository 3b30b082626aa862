package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.TpchFull
import graft.sources.DbgenGen

/** Original full-column TPC-H over the dbgen format: every query
  * executes on a generated tiny fixture. Value-exact correctness is
  * enforced by tools/selfcheck_dbgen.py (DuckDB oracle) in the local
  * verification loop.
  */
class TpchFullSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_dbgen_test")
    DbgenGen.write(d.toString)
    d.toString
  }
  private def ctx = TpchFull.DbgenCtx(spark, dir)

  test("all 22 original queries are declared with oracles") {
    assert(TpchFull.queries.size == 22)
    assert(TpchFull.oracles.keySet == TpchFull.queries.keySet)
  }

  test("q1 produces the classic 6-group pricing summary") {
    val rows = TpchFull.q1(ctx).collect()
    assert(rows.length == 6) // 3 returnflags × 2 linestatus
    assert(rows.forall(_.getLong(9) > 0)) // count_order
  }

  test("q4 counts only orders with a late lineitem") {
    val counts = TpchFull.q4(ctx).collect().map(_.getLong(1)).sum
    assert(counts > 0)
  }

  for ((name, fn) <- TpchFull.queries.toSeq.sortBy(_._1)) {
    test(s"dbgen $name executes") {
      assert(fn(ctx).count() >= 0)
    }
  }
}
