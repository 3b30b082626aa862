package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Kernels

class KernelsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("dsum is exact and partitioning-independent") {
    val vals = (1 to 10000).map(i => (i % 97) + 0.01 * (i % 100))
    val df1 = vals.toDF("x").repartition(1)
    val df7 = vals.toDF("x").repartition(7)
    val s1 = df1.agg(Kernels.dsum($"x")).head.getDouble(0)
    val s7 = df7.agg(Kernels.dsum($"x")).head.getDouble(0)
    assert(s1 == s7) // bit-identical, not approx
    val expected = BigDecimal(vals.map(BigDecimal(_)).sum.toDouble)
    assert(math.abs(s1 - expected.toDouble) < 1e-6)
  }

  test("davg matches sum/count") {
    val df = Seq(1.0, 2.0, 4.0).toDF("x")
    assert(df.agg(Kernels.davg($"x")).head.getDouble(0) == 7.0 / 3)
  }

  test("indicator builds 0/1 columns") {
    val out = Seq(1, 5, 10).toDF("x")
      .select(Kernels.indicator($"x" > 4).as("i")).as[Int].collect()
    assert(out.toSeq == Seq(0, 1, 1))
  }

  test("topK returns deterministic k rows with tie-break") {
    val df = Seq((1, "a"), (2, "b"), (2, "a"), (3, "z")).toDF("v", "k")
    val top = Kernels.topK(df, 2, $"v".desc, $"k".asc).collect()
    assert(top.map(_.getString(1)).toSeq == Seq("z", "a"))
  }

  test("groupedArgmax keeps all rows attaining the group max") {
    val df = Seq(("g1", 5), ("g1", 9), ("g2", 3), ("g2", 3)).toDF("g", "v")
    val got = Kernels.groupedArgmax(df, Seq("g"), $"v")
      .orderBy("g", "v").collect().map(r => (r.getString(0), r.getInt(1)))
    assert(got.toSeq == Seq(("g1", 9), ("g2", 3), ("g2", 3)))
  }

  test("joinSuffixed renames colliding right columns") {
    val l = Seq((1, "x")).toDF("k", "name")
    val r = Seq((1, "y")).toDF("k2", "name")
    val j = Kernels.joinSuffixed(l, r, Seq("k"), Seq("k2"))
    assert(j.columns.toSet == Set("k", "name", "k2", "name_right"))
    assert(j.count() == 1)
  }

  test("globalRank equals the single-partition row_number reference") {
    // values with heavy ties so the tie-break key does real work
    val rows = (0L until 997L).map(i => (i, (i * 7919) % 13))
    val df = rows.toDF("id", "v").repartition(9)
    val got = Kernels.globalRank(df, Seq($"v", $"id"), "rnk", width = 8)
      .select("id", "rnk", "n_total").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val expected = rows.sortBy(r => (r._2, r._1)).zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1L) }.toMap
    assert(got.view.mapValues(_._1).toMap == expected)
    assert(got.values.forall(_._2 == 997L))
  }

  test("globalRank is a permutation and layout/width-independent") {
    val rows = (0L until 500L).map(i => (i, math.sin(i.toDouble)))
    val a = Kernels.globalRank(rows.toDF("id", "x").repartition(3),
      Seq($"x", $"id"), "rnk", width = 4)
      .select("id", "rnk").collect().map(r => (r.getLong(0), r.getLong(1)))
    val b = Kernels.globalRank(rows.toDF("id", "x").repartition(17),
      Seq($"x", $"id"), "rnk", width = 11)
      .select("id", "rnk").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(a.map(_._2).sorted.toSeq == (1L to 500L))
    assert(a.toMap == b.toMap)
  }

  test("exactQuantiles selects the rank-defined values") {
    val rows = (1L to 1000L).map(i => (i, ((i * 7919) % 1000).toDouble))
    val df = rows.toDF("id", "x").repartition(7)
    val got = Kernels.exactQuantiles(df, $"x", Seq($"id"),
        Seq(0.25, 0.5, 0.75, 1.0)).collect()
      .map(r => r.getDouble(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val sorted = rows.map(_._2).sorted
    assert(got(0.25) == ((250L, sorted(249))))
    assert(got(0.5) == ((500L, sorted(499))))
    assert(got(0.75) == ((750L, sorted(749))))
    assert(got(1.0) == ((1000L, sorted(999))))
    // heavy ties: every value equal — all quantiles return it, ranks
    // still split across shards by the tie key
    val ties = (1L to 100L).map(i => (i, 42.0)).toDF("id", "x")
    val t = Kernels.exactQuantiles(ties, $"x", Seq($"id"), Seq(0.5, 1.0))
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getDouble(2)))
    assert(t.toSeq == Seq((0.5, 50L, 42.0), (1.0, 100L, 42.0)))
  }

  test("globalRank: empty frame and width exceeding the row count") {
    val empty = Seq.empty[(Long, Double)].toDF("id", "x")
    assert(Kernels.globalRank(empty, Seq($"x", $"id")).count() == 0)
    val tiny = Seq((3L, 1.0), (1L, 2.0)).toDF("id", "x")
    val got = Kernels.globalRank(tiny, Seq($"x", $"id"), "rnk", width = 16)
      .select("id", "rnk").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toMap == Map(3L -> 1L, 1L -> 2L))
  }
}
