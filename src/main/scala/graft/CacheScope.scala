package graft

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Scoped persist lifecycle for operator-internal caches.
  *
  * The dedup/similarity operators persist a heavyweight intermediate
  * (shingle sets, LSH signatures) that is referenced several times by
  * the ONE result plan they return. The result is lazy, so the operator
  * cannot unpersist before returning — but leaning on the session's
  * `clearCache()` (as Verify/Bench do between queries) pins executor
  * storage memory indefinitely in a long-lived user session that
  * composes operators and never clears.
  *
  * `cached(df)` persists and registers the intermediate; a per-session
  * `QueryExecutionListener` unpersists every registered intermediate
  * after the next completed action on the session — for the intended
  * call pattern (build the operator's DataFrame, run one action on it)
  * that is exactly "release after the terminal action". A second action
  * on the same returned DataFrame recomputes without the cache: correct,
  * just unaccelerated — callers wanting multi-action reuse should
  * persist the RESULT themselves, which is theirs to release.
  *
  * The release is deliberately session-wide, not plan-matched: matching
  * a listener's QueryExecution back to the operator that registered a
  * cache would need identity tracking through re-analysis, and the
  * failure mode of over-releasing is only a recompute, never a wrong
  * answer. The listener bus is asynchronous, so release lands shortly
  * after the action returns (specs poll; CacheLifecycleSpec).
  */
object CacheScope {
  private val pending = new ConcurrentHashMap[SparkSession, List[DataFrame]]()
  private val installed = ConcurrentHashMap.newKeySet[SparkSession]()

  /** Spec observability: when set on the calling thread, every
    * DataFrame registered by that thread is also appended here, so a
    * spec can assert its operator's own caches were released even while
    * unrelated suites share the session. */
  private[graft] val capture = new ThreadLocal[java.util.List[DataFrame]]()

  /** Persist `df` and release it after the next completed action. */
  def cached(df: DataFrame): DataFrame = { df.persist(); adopt(df) }

  /** Register an already-persisted DataFrame for release after the next
    * completed action on its session (for operators that materialize
    * their cache eagerly and only need the deferred release).
    *
    * The listener bus is drained FIRST: an operator that just ran an
    * internal action (the cluster loop's counts, a cold index build's
    * writes) would otherwise race that action's still-queued completion
    * event, which could claim and release the new registration before
    * the caller's terminal action ever starts. Draining makes "the next
    * completed action" mean an action completing after this call —
    * except for actions STILL RUNNING on other threads, whose release
    * remains the documented over-release (recompute, never wrong). */
  def adopt(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    org.apache.spark.sql.GraftShim.drainListenerBus(s)
    if (installed.add(s)) s.listenerManager.register(new Releaser(s))
    pending.merge(s, df :: Nil, (neu, old) => neu ::: old)
    val c = capture.get()
    if (c != null) c.add(df)
    df
  }

  private[graft] def pendingCount(s: SparkSession): Int = {
    val l = pending.get(s)
    if (l == null) 0 else l.size
  }

  private final class Releaser(s: SparkSession) extends QueryExecutionListener {
    override def onSuccess(funcName: String, qe: QueryExecution,
        durationNs: Long): Unit = release()
    override def onFailure(funcName: String, qe: QueryExecution,
        exception: Exception): Unit = release()
    private def release(): Unit = {
      val dfs = pending.remove(s) // atomic claim — safe under parallel actions
      if (dfs != null) dfs.foreach(_.unpersist())
    }
  }
}
