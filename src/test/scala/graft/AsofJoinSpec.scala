package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.AsofOps
import graft.plans.{AsofJoin, AsofJoinExec}

class AsofJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def left = Seq(
    (1L, 10L, 100L), // key 10: before any right row
    (2L, 10L, 205L), // matches right t=200
    (3L, 10L, 300L), // exact tie with right t=300
    (4L, 20L, 500L), // key 20 matches its own stream, not key 10's
    (5L, 30L, 999L)  // key 30: no right rows at all
  ).toDF("id", "k", "t")

  private def right = Seq(
    (10L, 200L, 2.0), (10L, 300L, 3.0), (10L, 400L, 4.0),
    (20L, 450L, 45.0), (20L, 500L, 50.0)
  ).toDF("rk", "rt", "v")

  test("backward as-of join matches latest right row at or before left time") {
    val out = AsofOps.asofJoin(left, right, "t", "rt", "k", "rk")
      .select("id", "rt", "v").collect()
      .map(r => r.getLong(0) -> ((
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))).toMap
    assert(out(1L) == ((None, None)))              // nothing at or before 10
    assert(out(2L) == ((Some(200L), Some(2.0))))   // 200 <= 205 < 300
    assert(out(3L) == ((Some(300L), Some(3.0))))   // ties match (<=)
    assert(out(4L) == ((Some(500L), Some(50.0))))  // key-isolated
    assert(out(5L) == ((None, None)))              // key with no right rows
  }

  test("string by-keys survive row-buffer reuse") {
    val l = Seq(("a", 5L, 1L), ("b", 5L, 2L), ("a", 9L, 3L))
      .toDF("k", "t", "id")
    val r = Seq(("a", 4L, 10.0), ("b", 5L, 20.0), ("a", 8L, 30.0))
      .toDF("rk", "rt", "v")
    val out = AsofOps.asofJoin(l, r, "t", "rt", "k", "rk")
      .select("id", "v").collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) -1.0 else x.getDouble(1)))
      .toMap
    assert(out == Map(1L -> 10.0, 2L -> 20.0, 3L -> 30.0))
  }

  test("as-of equals the union+window compositional form on random streams") {
    // compositional reference: tag both streams, window per key ordered
    // by (t, tag), last_value(v ignore nulls) over preceding rows
    val rnd = new scala.util.Random(7)
    val ls = (1 to 300).map(i =>
      (i.toLong, (rnd.nextInt(5) + 1).toLong, rnd.nextInt(1000).toLong))
    val rs = (1 to 200).map(i =>
      ((rnd.nextInt(5) + 1).toLong, rnd.nextInt(1000).toLong, rnd.nextDouble()))
      .groupBy(x => (x._1, x._2)).map(_._2.maxBy(_._3)).toSeq // unique (k, t)
    val l = ls.toDF("id", "k", "t")
    val r = rs.toDF("rk", "rt", "v")
    val viaPlan = AsofOps.asofJoin(l, r, "t", "rt", "k", "rk")
      .select("id", "v").collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) None else Some(x.getDouble(1))))
      .toMap
    val tagged = l.select(col("k"), col("t"), lit(1).as("tag"),
        col("id"), lit(null).cast("double").as("v"))
      .unionAll(r.select(col("rk").as("k"), col("rt").as("t"),
        lit(0).as("tag"), lit(null).cast("long").as("id"), col("v")))
    val w = Window.partitionBy("k").orderBy("t", "tag")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val viaWindow = tagged
      .withColumn("lastv", last("v", ignoreNulls = true).over(w))
      .where(col("tag") === 1)
      .select("id", "lastv").collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) None else Some(x.getDouble(1))))
      .toMap
    assert(viaPlan == viaWindow)
  }

  test("empty right side yields all-null matches; duplicate left times share one") {
    val emptyR = Seq.empty[(Long, Long, Double)].toDF("rk", "rt", "v")
    val allNull = AsofOps.asofJoin(left, emptyR, "t", "rt", "k", "rk")
      .select("id", "v").collect()
    assert(allNull.length == 5 && allNull.forall(_.isNullAt(1)))
    val dupL = Seq((1L, 10L, 250L), (2L, 10L, 250L)).toDF("id", "k", "t")
    val matches = AsofOps.asofJoin(dupL, right, "t", "rt", "k", "rk")
      .select("id", "v").collect().map(_.getDouble(1)).toSeq
    assert(matches == Seq(2.0, 2.0)) // both duplicates match rt=200
  }

  test("plans as AsofJoinExec with co-partitioning exchanges, no cartesian") {
    val df = AsofOps.asofJoin(left, right, "t", "rt", "k", "rk")
    val plan = df.queryExecution.executedPlan
    val s = plan.toString
    assert(s.contains("AsofJoin"), s)
    assert(!s.contains("Cartesian"), s)
    // both children hash-partitioned (EnsureRequirements exchanges)
    assert("hashpartitioning".r.findAllIn(s.toLowerCase).size >= 2, s)
  }

  test("narrow projections prune as-of join inputs down to the parquet scan") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val l = ev.select("event_id", "user_id", "event_type", "value", "props")
    val r = ev.select(col("event_id").as("r_ev"), col("user_id").as("r_user"),
      col("event_type").as("r_type"), col("value").as("r_value"),
      col("props").as("r_props"))
    val out = AsofOps.asofJoin(l, r, "event_id", "r_ev", "user_id", "r_user")
      .select("event_id", "r_value")
    // the unreferenced string columns must not reach the file scans
    val physical = out.queryExecution.executedPlan.toString
    assert(!physical.contains("props"), physical)
    assert(!physical.contains("event_type"), physical)
    assert(out.count() > 0)
  }

  test("left-only filters push below the as-of join") {
    val joined = AsofOps.asofJoin(left, right, "t", "rt", "k", "rk")
      .where(col("id") > 2L)
    val optimized = joined.queryExecution.optimizedPlan
    val aj = optimized.collect { case a: AsofJoin => a }
    assert(aj.nonEmpty, optimized.toString)
    // without the rule the Filter is stuck ABOVE the opaque AsofJoin;
    // with it, the filter moves below — where, over a LocalRelation,
    // constant folding absorbs it completely: no Filter node anywhere
    // and the left leaf carries only the surviving rows
    val filters = optimized.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f
    }
    assert(filters.isEmpty, optimized.toString)
    val leftRows = aj.head.left.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation =>
        l.data.length
    }
    assert(leftRows == Seq(3), optimized.toString)
    // and semantics are unchanged
    assert(joined.count() == 3)
  }
}
