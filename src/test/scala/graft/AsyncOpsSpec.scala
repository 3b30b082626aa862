package graft

import scala.concurrent.ExecutionContext.Implicits.global
import scala.concurrent.Await
import scala.concurrent.duration._
import org.scalatest.funsuite.AnyFunSuite
import graft.api.AsyncOps
import graft.queries.Ctx

class AsyncOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("computeAsync + gather run queries concurrently") {
    val c = Ctx(spark, "/root/testdata/sf0.001")
    val futs = Seq(
      AsyncOps.computeAsync(graft.queries.Tpch.q6(c)),
      AsyncOps.computeAsync(graft.queries.Tpch.q1(c)))
    val results = Await.result(AsyncOps.gather(futs), 120.seconds)
    assert(results(0).length == 1) // q6: single revenue row
    assert(results(1).length == 6) // q1: 6 groups
  }

  test("asCompleted yields every result exactly once") {
    val c = Ctx(spark, "/root/testdata/sf0.001")
    val futs = Seq(
      AsyncOps.computeAsync(graft.queries.Tpch.q6(c)),
      AsyncOps.computeAsync(graft.queries.Tpch.q14(c)),
      AsyncOps.computeAsync(graft.queries.Tpch.q19(c)))
    val seen = AsyncOps.asCompleted(futs).map(_._1).toList
    assert(seen.sorted == List(0, 1, 2))
  }
}
