package graft.api

import java.util.concurrent.{ConcurrentHashMap, CountDownLatch, Executors,
  LinkedBlockingQueue, Semaphore => JSemaphore, TimeUnit, TimeoutException}
import java.util.concurrent.atomic.AtomicBoolean
import java.util.concurrent.locks.ReentrantLock
import scala.concurrent.{ExecutionContext, Future, Promise}
import scala.jdk.CollectionConverters._

/** Driver-side coordination primitives — the reference's
  * queue/variable/lock/semaphore/event/pubsub/actor surface
  * (`/root/reference/distributed/queues.py:15-25`, `variable.py:18-26`,
  * `lock.py:15-22`, `semaphore.py`, `event.py`, `pubsub.py:202,358`,
  * `actor.py:12`). In the reference each primitive is a *named object
  * whose state lives in the scheduler* — the process every client
  * talks to. Spark's structural analog of that central point is the
  * driver, so these are named, process-wide, thread-safe objects in
  * the driver JVM: tasks composed with [[AsyncOps]] (`submit`/`map`,
  * the reference's client API) coordinate through them exactly as dask
  * clients coordinate through the scheduler.
  *
  * The deliberate non-goal boundary is unchanged (SURVEY §2.11 U7/U8):
  * code running *inside executors* cannot reach these — Spark's
  * execution model gives executors no backchannel — so they serve the
  * driver-orchestration patterns (producer/consumer pipelines, run
  * fencing, config broadcast between jobs), which is also where the
  * reference's own test-suite exercises them.
  *
  * Timeout semantics follow the reference: blocking calls raise
  * `TimeoutException` when the wait expires (dask raises
  * `asyncio.TimeoutError`). All primitives with the same (kind, name)
  * share state; `delete()` removes the name from the registry.
  */
object Coordination {

  private val registry = new ConcurrentHashMap[(String, String), AnyRef]()

  private def slot[T <: AnyRef](kind: String, name: String)(mk: => T): T =
    registry.computeIfAbsent((kind, name), _ => mk).asInstanceOf[T]

  private def await[A](ok: Boolean, value: => A): A =
    if (ok) value else throw new TimeoutException("coordination wait expired")

  /** Release a named primitive (the reference's refcounted release —
    * here an explicit delete, since a single JVM needs no refcounts).
    */
  def delete(kind: String, name: String): Unit = registry.remove((kind, name))

  /** Named FIFO queue (`queues.py` Queue): put/get/qsize with optional
    * bound and timeouts.
    */
  final class DistQueue[A] private[Coordination] (name: String, maxsize: Int) {
    private val q =
      if (maxsize > 0) new LinkedBlockingQueue[A](maxsize)
      else new LinkedBlockingQueue[A]()
    def put(a: A): Unit = q.put(a)
    def put(a: A, timeoutMs: Long): Unit =
      await(q.offer(a, timeoutMs, TimeUnit.MILLISECONDS), ())
    def get(): A = q.take()
    def get(timeoutMs: Long): A = {
      val v = q.poll(timeoutMs, TimeUnit.MILLISECONDS)
      await(v != null, v)
    }
    def qsize: Int = q.size()
  }
  def queue[A](name: String, maxsize: Int = 0): DistQueue[A] =
    slot("queue", name)(new DistQueue[A](name, maxsize))

  /** Named single-value variable (`variable.py` Variable): `get` blocks
    * until the first `set` (dask's get awaits the started condition).
    */
  final class DistVariable[A] private[Coordination] (name: String) {
    private val started = new CountDownLatch(1)
    @volatile private var value: A = _
    def set(a: A): Unit = { value = a; started.countDown() }
    def get(timeoutMs: Long = Long.MaxValue): A =
      await(started.await(timeoutMs, TimeUnit.MILLISECONDS), value)
    def delete(): Unit = Coordination.delete("variable", name)
  }
  def variable[A](name: String): DistVariable[A] =
    slot("variable", name)(new DistVariable[A](name))

  /** Named mutual-exclusion lock (`lock.py` Lock — non-reentrant in
    * dask, so acquisition is tracked per call site, not per thread;
    * we keep the fair non-reentrant flavor via a permit).
    */
  final class DistLock private[Coordination] (name: String) {
    private val permit = new JSemaphore(1, true)
    // release guard must be atomic: a check-then-act on availablePermits
    // would let two concurrent releases both pass and push permits to 2,
    // silently breaking mutual exclusion for every later holder
    private val held = new AtomicBoolean(false)
    def acquire(): Unit = { permit.acquire(); held.set(true) }
    def acquire(timeoutMs: Long): Boolean = {
      val ok = permit.tryAcquire(timeoutMs, TimeUnit.MILLISECONDS)
      if (ok) held.set(true)
      ok
    }
    def release(): Unit = {
      require(held.compareAndSet(true, false),
        s"lock $name released while not acquired")
      permit.release()
    }
    def locked: Boolean = held.get()
    def withLock[B](f: => B): B = { acquire(); try f finally release() }
  }
  def lock(name: String): DistLock = slot("lock", name)(new DistLock(name))

  /** Named counting semaphore (`semaphore.py`): bounded lease pool. */
  final class DistSemaphore private[Coordination] (name: String, leases: Int) {
    private val permit = new JSemaphore(leases, true)
    def acquire(timeoutMs: Long = Long.MaxValue): Boolean =
      permit.tryAcquire(timeoutMs, TimeUnit.MILLISECONDS)
    def release(): Unit = permit.release()
    def available: Int = permit.availablePermits()
  }
  def semaphore(name: String, leases: Int): DistSemaphore =
    slot("semaphore", name)(new DistSemaphore(name, leases))

  /** Named event flag (`event.py` Event): set/clear/wait. */
  final class DistEvent private[Coordination] (name: String) {
    private val lockObj = new Object
    private var flag = false
    def set(): Unit = lockObj.synchronized { flag = true; lockObj.notifyAll() }
    def clear(): Unit = lockObj.synchronized { flag = false }
    def isSet: Boolean = lockObj.synchronized(flag)
    def waitSet(timeoutMs: Long = Long.MaxValue): Boolean =
      lockObj.synchronized {
        val start = System.nanoTime()
        // toNanos saturates at Long.MaxValue, so the default
        // "wait forever" call can't overflow into an already-expired
        // deadline (ms*1e6 wraps for timeoutMs >= ~9.2e12)
        val budgetNs = TimeUnit.MILLISECONDS.toNanos(timeoutMs)
        while (!flag) {
          val leftMs = (budgetNs - (System.nanoTime() - start)) / 1000000L
          if (leftMs <= 0) return false
          lockObj.wait(leftMs)
        }
        true
      }
  }
  def event(name: String): DistEvent = slot("event", name)(new DistEvent(name))

  /** Topic-based pub/sub (`pubsub.py` Pub/Sub): each subscriber owns a
    * queue and receives every message published after it subscribed —
    * dask's semantics (Subs miss messages published before they join).
    */
  final class Topic[A] private[Coordination] (name: String) {
    private val subs = ConcurrentHashMap.newKeySet[LinkedBlockingQueue[A]]()
    private[Coordination] def subscribe(): LinkedBlockingQueue[A] = {
      val q = new LinkedBlockingQueue[A]()
      subs.add(q); q
    }
    private[Coordination] def unsubscribe(q: LinkedBlockingQueue[A]): Unit =
      subs.remove(q)
    def put(msg: A): Unit = subs.asScala.foreach(_.put(msg))
    def subscriberCount: Int = subs.size()
  }
  final class Pub[A] private[Coordination] (topic: Topic[A]) {
    def put(msg: A): Unit = topic.put(msg)
  }
  final class Sub[A] private[Coordination] (topic: Topic[A]) {
    private val q = topic.subscribe()
    def get(timeoutMs: Long = Long.MaxValue): A = {
      val v = q.poll(timeoutMs, TimeUnit.MILLISECONDS)
      await(v != null, v)
    }
    def close(): Unit = topic.unsubscribe(q)
  }
  private def topic[A](name: String): Topic[A] =
    slot("topic", name)(new Topic[A](name))
  def pub[A](name: String): Pub[A] = new Pub[A](topic[A](name))
  def sub[A](name: String): Sub[A] = new Sub[A](topic[A](name))

  /** Stateful actor (`actor.py` Actor/ActorFuture): one mutable object,
    * methods executed strictly sequentially on a dedicated thread,
    * results returned as futures. dask proxies attribute access over
    * the network (`actor.py:123`); on the JVM the typed equivalents are
    * `ask` (call returning a value) and `tell` (fire-and-forget), both
    * serialized through the actor's single-thread executor so state
    * needs no synchronization — the actor-model guarantee.
    */
  final class ActorHandle[T] private[Coordination] (state: T) {
    private val exec = Executors.newSingleThreadExecutor { r =>
      val t = new Thread(r, "graft-actor"); t.setDaemon(true); t
    }
    def ask[B](f: T => B): Future[B] = {
      val p = Promise[B]()
      exec.execute(() => p.complete(scala.util.Try(f(state))))
      p.future
    }
    def tell(f: T => Unit): Unit = exec.execute(() => f(state))
    def stop(): Unit = exec.shutdown()
  }
  def actor[T](name: String, mk: => T): ActorHandle[T] =
    slot("actor", name)(new ActorHandle[T](mk))

  /** ExecutionContext for composing actor futures with [[AsyncOps]]. */
  lazy val directEc: ExecutionContext = ExecutionContext.parasitic

  /** The reference's `Client.run` (`client.py`, docs
    * `docs/source/api.rst`): run a diagnostic closure on every worker
    * and gather the results keyed by worker. Spark executors host no
    * callable server, but the same shape is one barrier job: one task
    * per execution slot (`defaultParallelism` partitions), held at a
    * `BarrierTaskContext.barrier()` so ALL slots are occupied
    * simultaneously — which forces every executor in the cluster to
    * run at least one invocation (no slot can be reused until all have
    * started). Results collapse to one per executor, the reference's
    * per-worker view; [[runOnSlots]] returns the raw per-slot results.
    *
    * Use cases mirror `Client.run`'s: environment probes (JVM
    * version, heap, native-BLAS presence), cache warming, GC nudges.
    * The U7 boundary is unchanged: the closure runs ON executors but
    * cannot launch jobs or reach driver-side primitives from there.
    */
  def runOnExecutors[A: scala.reflect.ClassTag](
      spark: org.apache.spark.sql.SparkSession,
      requireAllSlots: Boolean = true)(f: () => A): Map[String, A] =
    runOnSlots(spark, requireAllSlots)(f).groupBy(_._1)
      .map { case (exec, rs) => exec -> rs.minBy(_._2)._3 }

  /** [[runOnExecutors]] without the per-executor collapse: one
    * `(executorId, slot, result)` triple per execution slot.
    *
    * PRECONDITION (`requireAllSlots = true`, the default): all
    * `defaultParallelism` slots must be simultaneously free — the
    * barrier stage cannot schedule otherwise and the job aborts after
    * retries (e.g. under dynamic allocation or concurrent jobs). When
    * the every-executor guarantee isn't worth a potential abort —
    * opportunistic probes, cache warming alongside other work — pass
    * `requireAllSlots = false` for the non-barrier BEST-EFFORT form:
    * the same per-slot tasks without the rendezvous, schedulable on
    * however many slots are free, but free to reuse a slot, so some
    * executors may be probed twice and others not at all.
    */
  def runOnSlots[A: scala.reflect.ClassTag](
      spark: org.apache.spark.sql.SparkSession,
      requireAllSlots: Boolean = true)(
      f: () => A): Seq[(String, Int, A)] = {
    val sc = spark.sparkContext
    val slots = math.max(sc.defaultParallelism, 1)
    val rdd = sc.range(0L, slots.toLong, 1L, slots)
    val probed =
      if (requireAllSlots)
        rdd.barrier().mapPartitions { _ =>
          val tc = org.apache.spark.BarrierTaskContext.get()
          tc.barrier()
          Iterator((org.apache.spark.SparkEnv.get.executorId,
            tc.partitionId(), f()))
        }
      else
        rdd.mapPartitionsWithIndex { (pid, _) =>
          Iterator((org.apache.spark.SparkEnv.get.executorId, pid, f()))
        }
    probed.collect().toSeq
  }
}
