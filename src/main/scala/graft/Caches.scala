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

  /** Persist `ds` and register it for the next [[release]]. */
  def scoped[T](ds: Dataset[T]): Dataset[T] = {
    ds.persist()
    live.add(ds)
    ds
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
