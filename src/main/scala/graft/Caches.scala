package graft

import org.apache.spark.sql.Dataset

/** Registry for operator-path persists, so long-lived sessions can
  * release them deterministically.
  *
  * Several operators persist a shared intermediate that multiple
  * branches of their own DAG re-read (shingle tables, signature
  * tables, the corpus-clean projection). The operator cannot unpersist
  * it itself — the caller materializes the returned DataFrame after
  * the operator function has returned — so without bookkeeping every
  * invocation pins cache entries for the session's lifetime: a
  * 60-query sweep accumulates dozens of cached plans, hundreds of MB
  * each at sf10, and a production session serving repeated queries
  * would leak without bound.
  *
  * Contract: operators route every persist through [[scoped]]; callers
  * (Bench, Verify, application code) call [[release]] after the
  * terminal action on a returned DataFrame. Bench enforces the
  * contract by asserting `getPersistentRDDs.isEmpty` after each query.
  */
object Caches {

  private val live = new java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]()

  // Nested per-caller scopes (r14 advice): a streaming micro-batch must
  // release ONLY the caches its own plan construction registered —
  // calling the global [[release]] from foreachBatch would unpersist
  // the scoped caches of any concurrently running query or second
  // arrival stream mid-flight. Plan construction is synchronous on the
  // calling thread, so a ThreadLocal stack scopes every [[scoped]]
  // call made inside [[withScope]] (including ones made by operators
  // it calls, e.g. Clusters.mergeIncrementalDelta) to that caller.
  private val scopes =
    new ThreadLocal[List[scala.collection.mutable.ArrayBuffer[Dataset[_]]]] {
      override def initialValue: List[scala.collection.mutable.ArrayBuffer[Dataset[_]]] = Nil
    }

  /** Persist `ds` and register it for the enclosing [[withScope]] if
    * one is active on this thread, else for the next [[release]]. */
  def scoped[T](ds: Dataset[T]): Dataset[T] = {
    ds.persist()
    scopes.get() match {
      case head :: _ => head += ds
      case Nil       => live.add(ds)
    }
    ds
  }

  /** Run `body`, then unpersist exactly the caches [[scoped]] registered
    * during it on this thread — terminal actions on the scoped frames
    * must happen inside `body`. Nestable; never touches the global
    * queue or another thread's scopes.
    */
  def withScope[A](body: => A): A = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[Dataset[_]]
    scopes.set(buf :: scopes.get())
    try body
    finally {
      scopes.set(scopes.get().tail)
      buf.foreach(_.unpersist(blocking = true))
    }
  }

  /** Unpersist everything registered since the last release. Blocking
    * so a following timing measurement never races cache eviction.
    */
  def release(): Unit = {
    var d = live.poll()
    while (d != null) {
      d.unpersist(blocking = true)
      d = live.poll()
    }
  }
}
