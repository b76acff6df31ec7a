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
final class CacheScope {
  private val frames = new java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]()

  /** Persist (MEMORY_AND_DISK) and register for later release. */
  def cache[T](ds: Dataset[T]): Dataset[T] = {
    ds.persist(StorageLevel.MEMORY_AND_DISK)
    frames.add(ds)
    ds
  }

  /** Unpersist every registered frame. Safe to call repeatedly; the
    * scope is reusable afterwards.
    */
  def release(blocking: Boolean = false): Unit = {
    var d = frames.poll()
    while (d != null) { d.unpersist(blocking); d = frames.poll() }
  }
}

object CacheScope {
  private val threadShared: ThreadLocal[CacheScope] =
    ThreadLocal.withInitial(() => new CacheScope)

  /** Default scope for callers that don't manage one. THREAD-CONFINED:
    * each thread gets its own default scope, so two concurrent callers
    * that both fall back to the default can never unpersist each
    * other's still-lazy frames (a process-global default made
    * `release()` from one job silently drop the other's caches).
    * Nothing releases it automatically — sessions running several
    * mining jobs should either pass their own scope or call
    * `CacheScope.shared.release()` between jobs, FROM THE SAME THREAD
    * that ran the job (Bench/Verify do, per query).
    */
  def shared: CacheScope = threadShared.get()


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
