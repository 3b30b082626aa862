package graft

import org.scalatest.funsuite.AnyFunSuite
import java.util.concurrent.TimeoutException
import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global
import graft.api.Coordination

class CoordinationSpec extends AnyFunSuite {

  test("named queue is FIFO, shared by name, and times out on empty get") {
    val q1 = Coordination.queue[Int]("cq-fifo")
    val q2 = Coordination.queue[Int]("cq-fifo") // same name → same state
    q1.put(1); q1.put(2)
    assert(q2.qsize == 2 && q2.get() == 1 && q1.get() == 2)
    intercept[TimeoutException](q1.get(timeoutMs = 50))
    Coordination.delete("queue", "cq-fifo")
  }

  test("bounded queue blocks producers at maxsize") {
    val q = Coordination.queue[Int]("cq-bounded", maxsize = 1)
    q.put(1)
    intercept[TimeoutException](q.put(2, timeoutMs = 50))
    assert(q.get() == 1)
    Coordination.delete("queue", "cq-bounded")
  }

  test("queue coordinates producer/consumer across threads") {
    val q = Coordination.queue[Long]("cq-pipe")
    val producer = Future { (1L to 100L).foreach(q.put) }
    val got = (1 to 100).map(_ => q.get(timeoutMs = 5000)).sum
    Await.result(producer, 5.seconds)
    assert(got == 5050L)
    Coordination.delete("queue", "cq-pipe")
  }

  test("variable get blocks until first set, then returns latest") {
    val v = Coordination.variable[String]("cv-var")
    intercept[TimeoutException](v.get(timeoutMs = 50))
    val waiter = Future(v.get(timeoutMs = 5000))
    v.set("a")
    assert(Await.result(waiter, 5.seconds) == "a")
    v.set("b")
    assert(v.get() == "b")
    v.delete()
  }

  test("lock provides mutual exclusion and release checking") {
    val l = Coordination.lock("cl-lock")
    assert(!l.locked)
    l.acquire()
    assert(l.locked)
    assert(!l.acquire(timeoutMs = 50)) // non-reentrant: second acquire fails
    l.release()
    intercept[IllegalArgumentException](l.release())
    // mutual exclusion under contention: counter increments never race
    var n = 0
    val fs = (1 to 8).map(_ => Future((1 to 500).foreach { _ =>
      l.withLock { n += 1 }
    }))
    Await.result(Future.sequence(fs), 30.seconds)
    assert(n == 4000)
    Coordination.delete("lock", "cl-lock")
  }

  test("semaphore bounds concurrent leases") {
    val s = Coordination.semaphore("cs-sem", leases = 2)
    assert(s.acquire(50) && s.acquire(50) && !s.acquire(50))
    s.release()
    assert(s.available == 1)
    Coordination.delete("semaphore", "cs-sem")
  }

  test("event waitSet with the default timeout blocks until set") {
    // regression: Long.MaxValue ms * 1e6 overflowed to a deadline in
    // the past, so the no-arg "wait forever" returned false instantly
    val e = Coordination.event("ce-forever")
    val waiter = Future(e.waitSet()) // default = wait forever
    Thread.sleep(100)
    assert(!waiter.isCompleted) // must still be blocked, not false
    e.set()
    assert(Await.result(waiter, 5.seconds))
    Coordination.delete("event", "ce-forever")
  }

  test("concurrent double release cannot inflate the lock's permits") {
    val l = Coordination.lock("cl-dblrel")
    l.acquire()
    // exactly one of two racing releases may win; the loser must throw
    val rels = (1 to 2).map(_ => Future(scala.util.Try(l.release())))
    val outcomes = Await.result(Future.sequence(rels), 5.seconds)
    assert(outcomes.count(_.isSuccess) == 1)
    // mutual exclusion still intact: re-acquire succeeds exactly once
    assert(l.acquire(timeoutMs = 50) && !l.acquire(timeoutMs = 50))
    l.release()
    Coordination.delete("lock", "cl-dblrel")
  }

  test("event wakes waiters on set and supports clear") {
    val e = Coordination.event("ce-ev")
    assert(!e.waitSet(timeoutMs = 50))
    val waiter = Future(e.waitSet(timeoutMs = 5000))
    e.set()
    assert(Await.result(waiter, 5.seconds) && e.isSet)
    e.clear()
    assert(!e.isSet)
    Coordination.delete("event", "ce-ev")
  }

  test("pubsub fans out to every subscriber from subscribe time on") {
    val p = Coordination.pub[Int]("ct-topic")
    p.put(1) // before any sub: dropped (dask semantics)
    val s1 = Coordination.sub[Int]("ct-topic")
    p.put(2)
    val s2 = Coordination.sub[Int]("ct-topic")
    p.put(3)
    assert(s1.get(1000) == 2 && s1.get(1000) == 3)
    assert(s2.get(1000) == 3)
    intercept[TimeoutException](s2.get(timeoutMs = 50))
    s1.close(); s2.close()
    Coordination.delete("topic", "ct-topic")
  }

  test("actor serializes stateful method calls and returns futures") {
    final class Counter { var n = 0; def inc(): Int = { n += 1; n } }
    val a = Coordination.actor("ca-counter", new Counter)
    val results = (1 to 200).map(_ => a.ask(_.inc()))
    val vals = Await.result(Future.sequence(results), 10.seconds)
    // strict serialization: results are exactly 1..200, no lost updates
    assert(vals.sorted == (1 to 200))
    a.tell(_.n = 0)
    assert(Await.result(a.ask(_.n), 5.seconds) == 0)
    a.stop()
    Coordination.delete("actor", "ca-counter")
  }

  test("runOnExecutors runs once per slot and gathers per executor") {
    val spark = TestSpark.spark
    CoordinationSpec.invocations.set(0)
    val perExec = Coordination.runOnExecutors(spark) { () =>
      CoordinationSpec.invocations.incrementAndGet()
      System.getProperty("java.version")
    }
    val slots = spark.sparkContext.defaultParallelism
    // the barrier held every slot simultaneously → exactly one
    // invocation per slot, none reused
    assert(CoordinationSpec.invocations.get() == slots)
    // local mode = a single "driver" executor; results keyed per
    // executor, the reference Client.run view
    assert(perExec.keySet == Set("driver"))
    assert(perExec("driver") == System.getProperty("java.version"))
    val perSlot = Coordination.runOnSlots(spark)(() => 1)
    assert(perSlot.map(_._2).sorted == (0 until slots))
    assert(perSlot.map(_._3).sum == slots)
  }
}

object CoordinationSpec {
  /** JVM-static so executor-side increments are visible in local mode. */
  val invocations = new java.util.concurrent.atomic.AtomicLong(0L)
}
