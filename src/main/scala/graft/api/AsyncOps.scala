package graft.api

import scala.concurrent.{ExecutionContext, Future}
import scala.util.Try
import org.apache.spark.sql.{DataFrame, Row}

/** Futures-API parity (SURVEY §1.1 / §2.13): the reference's eager
  * handles — `Client.compute` → `Future`, `client.gather`, `wait`,
  * `as_completed` (`/root/reference/distributed/client.py:2730, 1892,
  * 4230, 4278`) — expressed over Spark's async actions. Spark's model
  * is job-at-a-time rather than per-task futures (the scheduler owns
  * task granularity), so the parity surface is at the collection
  * level: submit N queries concurrently, consume results as they
  * complete. Actors/queues/locks remain non-goals (engine plumbing,
  * not query capabilities — SURVEY §1.1).
  */
object AsyncOps {

  /** `client.compute(df)` — start materialization, return a handle. */
  def computeAsync(df: DataFrame)(implicit ec: ExecutionContext): Future[Array[Row]] =
    Future(df.collect())

  /** `fire_and_forget` (`distributed/client.py:4603`): launch the
    * computation without retaining a handle — the job runs to
    * completion on the cluster regardless of the caller. Spark jobs
    * are driver-tracked, not handle-refcounted, so dropping the future
    * is already safe; this makes the intent explicit.
    */
  def fireAndForget(df: DataFrame)(implicit ec: ExecutionContext): Unit = {
    Future(df.foreach(_ => ())): Unit
  }

  private val inflight =
    new java.util.concurrent.ConcurrentHashMap[String, Future[Array[Row]]]

  /** Pure-function key dedup (`distributed/client.py:1530-1533`): dask
    * content-hashes task keys, so submitting the same computation
    * twice yields the SAME future. Spark's analogue of the content
    * hash is the canonicalized logical plan — semantically identical
    * queries share one in-flight job/result here.
    */
  def computeAsyncCached(df: DataFrame)(
      implicit ec: ExecutionContext): Future[Array[Row]] =
    inflight.computeIfAbsent(
      df.queryExecution.analyzed.canonicalized.toString,
      _ => Future(df.collect()))

  /** `client.gather(futures)` — await all results (order preserved). */
  def gather(futures: Seq[Future[Array[Row]]])(
      implicit ec: ExecutionContext): Future[Seq[Array[Row]]] =
    Future.sequence(futures)

  /** `as_completed` — a stream of (index, Try) in completion order.
    * Failures are surfaced as `Failure` elements rather than silently
    * dropped (a dropped element would leave the consumer blocked
    * forever on `queue.take()`), matching the reference's behavior of
    * yielding errored futures to the caller
    * (`distributed/client.py:4278`).
    */
  def asCompleted[A](futures: Seq[Future[A]])(
      implicit ec: ExecutionContext): Iterator[(Int, Try[A])] = {
    val queue = new java.util.concurrent.LinkedBlockingQueue[(Int, Try[A])]()
    futures.zipWithIndex.foreach { case (f, i) =>
      f.onComplete(r => queue.put((i, r)))
    }
    Iterator.fill(futures.size)(queue.take())
  }
}
