package graft.util

import org.apache.spark.sql.Dataset
import org.apache.spark.storage.StorageLevel

/** Caller-owned lifecycle for frames persisted inside multi-consumer
  * operators (the pairwise dedup/similarity miners persist their
  * exploded index/signature frames because several join sides and a
  * hot-key aggregate consume them).
  *
  * The returned mining frames are lazy, so the operator itself can
  * never know when it is safe to unpersist — that decision belongs to
  * the caller. Each miner therefore takes a [[CacheScope]]; after the
  * caller has fully consumed the result it calls [[CacheScope.release]]
  * and every intermediate registered by that mining job is unpersisted
  * deterministically. Two consecutive mining jobs in one session leave
  * zero cached blocks behind (pinned by DedupSpec).
  *
  * At real scale the alternative is writing the intermediate
  * index/signature tables out once and reading them back — the scope
  * seam keeps that swap local to the miner.
  */
final class CacheScope private[util] (
    private[util] val isDefault: Boolean) {
  def this() = this(false)

  private val frames = new java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]()
  private val hooks =
    new java.util.concurrent.ConcurrentLinkedQueue[Boolean => Unit]()

  /** Persist (MEMORY_AND_DISK) and register for later release. */
  def cache[T](ds: Dataset[T]): Dataset[T] = {
    ds.persist(StorageLevel.MEMORY_AND_DISK)
    frames.add(ds)
    CacheScope.touch(this)
    ds
  }

  /** Register extra cleanup to run on [[release]] — for storage that
    * `Dataset.unpersist` cannot reach (e.g. `localCheckpoint` persists
    * the physical RDD directly, outside the cache manager; the
    * connected-components loop registers its final round's blocks
    * here). The hook receives release's `blocking` flag and runs at
    * most once.
    */
  def onRelease(f: Boolean => Unit): Unit = {
    hooks.add(f)
    CacheScope.touch(this)
  }

  /** Unpersist every registered frame and run every registered hook.
    * Safe to call repeatedly; the scope is reusable afterwards.
    */
  def release(blocking: Boolean = false): Unit = {
    var d = frames.poll()
    while (d != null) { d.unpersist(blocking); d = frames.poll() }
    var h = hooks.poll()
    while (h != null) { h(blocking); h = hooks.poll() }
  }
}

object CacheScope {
  // Every default scope with anything REGISTERED, so a cleanup pass
  // from ANY thread can reach scopes confined to pool threads it does
  // not own. STRONGLY held, deliberately: `Dataset.persist` registers
  // the plan in Spark SQL's CacheManager, which holds it STRONGLY —
  // GC'ing an unreachable scope would NOT let ContextCleaner sweep its
  // cached blocks (the CacheManager entry pins them); it would only
  // discard the one handle that can still `unpersist` them, turning a
  // recoverable pin into an unrecoverable leak. BOUNDED, also
  // deliberately: [[releaseAll]] deregisters each scope it drains and
  // [[touch]] re-registers a default scope whenever something new is
  // cached into it — so the set tracks scopes with live registrations,
  // not every pool thread that ever existed (unbounded thread churn
  // would otherwise grow it monotonically).
  private val liveDefaults = java.util.Collections.newSetFromMap(
    new java.util.concurrent.ConcurrentHashMap[CacheScope, java.lang.Boolean]())

  /** Re-register a DEFAULT scope on every registration into it (cheap:
    * one concurrent-set add). Caller-owned scopes never enter the set —
    * their lifecycle is the caller's.
    */
  private[util] def touch(s: CacheScope): Unit =
    if (s.isDefault) { liveDefaults.add(s); () }

  private val threadShared: ThreadLocal[CacheScope] =
    ThreadLocal.withInitial(() => new CacheScope(isDefault = true))

  /** Default scope for callers that don't manage one. THREAD-CONFINED:
    * each thread gets its own default scope, so two concurrent callers
    * that both fall back to the default can never unpersist each
    * other's still-lazy frames (a process-global default made
    * `release()` from one job silently drop the other's caches).
    * Nothing releases it automatically — sessions running several
    * mining jobs should either pass their own scope or call
    * `CacheScope.shared.release()` between jobs, FROM THE SAME THREAD
    * that ran the job (Bench/Verify do, per query). Work dispatched to
    * pool threads (streaming `foreachBatch`, executor pools) leaves
    * per-thread scopes the dispatcher cannot reach — sweep those with
    * [[releaseAll]].
    */
  def shared: CacheScope = threadShared.get()

  /** Release EVERY thread's default scope — the cross-thread cleanup
    * for work that cached via [[shared]] on threads the caller does not
    * control (e.g. a streaming foreachBatch pool). Explicit caller-owned
    * scopes are not touched. Safe to run concurrently with active jobs
    * only if those jobs own their scopes (releasing a default scope a
    * pool thread is still lazily consuming would trigger silent
    * recompute) — intended for between-jobs / shutdown sweeps.
    */
  def releaseAll(blocking: Boolean = false): Unit = {
    val it = liveDefaults.iterator()
    while (it.hasNext) {
      val s = it.next()
      // Deregister BEFORE draining: a concurrent cache() into this
      // scope re-adds it via touch(), so nothing registered after the
      // drain can end up in a scope the next sweep cannot reach.
      // (Concurrent releaseAll with ACTIVE default-scope jobs is
      // already documented unsafe — this ordering just keeps the
      // between-jobs contract airtight.)
      it.remove()
      s.release(blocking)
    }
  }

  /** Convenience: run `f` with a fresh scope, releasing on exit. Only
    * usable when `f` fully materializes what it needs (an action runs
    * inside) — returning a lazy frame from `f` would read unpersisted
    * caches and silently recompute.
    */
  def withScope[A](f: CacheScope => A): A = {
    val s = new CacheScope
    try f(s)
    finally s.release()
  }
}
