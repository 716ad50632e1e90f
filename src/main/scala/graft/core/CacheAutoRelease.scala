package graft.core

import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Self-cleaning operator caches: unpersist an operator-internal persisted
  * relation once the first query that CONSUMED it completes.
  *
  * The pair/dedup operators persist multi-consumer intermediates (shingle
  * arrays, band keys, size-gate small sides) so they are computed once per
  * returned query instead of once per consumer. Left alone, those cached
  * relations outlive the query: a long-running driver that constructs many
  * operators accumulates CacheManager entries until someone calls
  * `spark.catalog.clearCache()`. This helper arms a one-shot
  * [[QueryExecutionListener]] per cache: when any completed query execution
  * (success or failure) contains the cached subtree, the cache is dropped
  * and the listener unregisters itself.
  *
  * "First use" is the right release point for caches whose consumers all
  * sit inside ONE returned query (the operators' shape): the single action
  * that materializes the result is also the last reader. A caller that
  * re-executes the same DataFrame afterwards recomputes the intermediate —
  * correct, just uncached, the same contract `clearCache` gives.
  *
  * Listener events are delivered ASYNCHRONOUSLY (ExecutionListenerBus), so
  * registration order alone cannot exclude the operator's own eager gate
  * probes: a probe's execution-end event may arrive after registration and
  * its plan contains the cached subtree. The guard is the monotonic
  * [[QueryExecution.id]]: a sentinel id is allocated at registration and
  * only executions CREATED after it (id greater than the sentinel's) can
  * release — late-delivered probe events carry an earlier id and are
  * ignored. If the returned query is never executed the cache stays
  * resident (as it always did); the listener is a no-op entry until then.
  */
private[graft] object CacheAutoRelease {

  /** Arm auto-release for `cached` (an already-persisted DataFrame) and
    * return it. Matching is by canonicalized subtree equality against each
    * finished execution's analyzed plan. */
  def afterFirstUse(cached: DataFrame): DataFrame = {
    val session = cached.sparkSession
    val target = cached.queryExecution.analyzed
    // Id watermark: constructing any Dataset allocates the next monotonic
    // QueryExecution id, so every execution created before this point —
    // including the operator's own gate probes, whose async bus events may
    // not have been delivered yet — has a smaller id and can never fire
    // the release.
    val sentinelId = session.range(1).queryExecution.id
    val released = new AtomicBoolean(false)
    val listener: QueryExecutionListener = new QueryExecutionListener {
      private def maybeRelease(qe: QueryExecution): Unit = {
        // Never let bookkeeping break a user query: a plan we cannot
        // inspect simply doesn't release the cache.
        val hit =
          try qe.id > sentinelId && qe.analyzed.exists(_.sameResult(target))
          catch { case _: Throwable => false }
        if (hit && released.compareAndSet(false, true)) {
          try cached.unpersist(blocking = false)
          finally session.listenerManager.unregister(this)
        }
      }
      override def onSuccess(funcName: String, qe: QueryExecution,
                             durationNs: Long): Unit = maybeRelease(qe)
      override def onFailure(funcName: String, qe: QueryExecution,
                             exception: Exception): Unit = maybeRelease(qe)
    }
    session.listenerManager.register(listener)
    cached
  }
}
