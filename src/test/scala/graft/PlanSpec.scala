package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.{Ctx, Tpch}

/** Plan-shape regression guards: the scale properties that make these
  * queries viable at 100 TB must stay visible in the physical plan.
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def ctx = Ctx(spark, "/root/testdata/sf0.001")

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("q6: filters and projection reach the parquet scan") {
    val p = planOf(Tpch.q6(ctx))
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), p)
    // column pruning: only the 4 needed columns in ReadSchema
    assert(p.contains("ReadSchema: struct<l_quantity:double,l_extendedprice:double,l_discount:double,l_shipdate"), p)
  }

  test("q3: top-k plans as TakeOrderedAndProject, not a global sort") {
    val p = planOf(Tpch.q3(ctx))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q5: dimension joins broadcast (no shuffle join in the chain)") {
    val p = planOf(Tpch.q5(ctx))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q20: qualified set broadcasts — no sort-merge join in the suite's last holdout") {
    val p = planOf(Tpch.q20(ctx))
    assert(p.contains("LeftSemi"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q21: EXISTS/NOT EXISTS plan as semi/anti joins") {
    val p = planOf(Tpch.q21(ctx))
    assert(p.contains("LeftSemi"), p)
    assert(p.contains("LeftAnti"), p)
  }
}
