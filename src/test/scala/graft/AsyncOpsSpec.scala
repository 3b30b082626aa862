package graft

import scala.concurrent.ExecutionContext.Implicits.global
import scala.concurrent.Await
import scala.concurrent.duration._
import org.scalatest.funsuite.AnyFunSuite
import graft.api.AsyncOps
import graft.queries.Ctx

/** Executor-side probe for the fire-and-forget test (local mode:
  * executors share the JVM, so a static counter observes task work).
  */
object FireAndForgetProbe {
  val counter = new java.util.concurrent.atomic.AtomicLong(0)
}

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

  test("asCompleted surfaces failures instead of deadlocking") {
    import scala.concurrent.Future
    val futs = Seq(
      Future.successful(1),
      Future.failed[Int](new RuntimeException("boom")),
      Future.successful(3))
    val results = AsyncOps.asCompleted(futs).toList
    assert(results.size == 3)
    assert(results.count(_._2.isFailure) == 1)
    assert(results.find(_._2.isFailure).get._1 == 1)
  }

  test("computeAsyncCached dedups semantically identical submissions") {
    val c = Ctx(spark, "/root/testdata/sf0.001")
    // two independently-constructed but identical plans → same future
    val f1 = AsyncOps.computeAsyncCached(graft.queries.Tpch.q6(c))
    val f2 = AsyncOps.computeAsyncCached(graft.queries.Tpch.q6(c))
    assert(f1 eq f2)
    val f3 = AsyncOps.computeAsyncCached(graft.queries.Tpch.q14(c))
    assert(!(f1 eq f3))
    assert(Await.result(f1, 120.seconds).length == 1)
  }

  test("fireAndForget completes without a retained handle") {
    import spark.implicits._
    FireAndForgetProbe.counter.set(0)
    val ds = spark.range(0, 50).as[Long]
      .map { x => FireAndForgetProbe.counter.incrementAndGet(); x }
    AsyncOps.fireAndForget(ds.toDF())
    val deadline = System.currentTimeMillis() + 60000
    while (FireAndForgetProbe.counter.get() < 50 &&
        System.currentTimeMillis() < deadline) Thread.sleep(50)
    assert(FireAndForgetProbe.counter.get() == 50)
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
