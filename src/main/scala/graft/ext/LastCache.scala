package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Bounded persist() holder for operators that cache an intermediate (band
  * tables, shingle tables, IVF assignments) consumed by a lazily-returned
  * plan. The returned frame still depends on the cache, so the operator
  * cannot unpersist before the caller materializes; instead each operator
  * holds AT MOST ONE live cache — a new call releases the previous one —
  * so repeated calls in a long-lived session no longer accumulate cached
  * RDDs until eviction pressure (round-1 ADVICE). An old returned frame
  * re-materialized after release simply recomputes from lineage (the cache
  * is a performance artifact, never a correctness one — which is also why
  * this beats localCheckpoint: lineage survives executor loss).
  */
private[ext] final class LastCache {
  private val ref = new java.util.concurrent.atomic.AtomicReference[DataFrame]()

  /** Persist `df` (spillable), materialize it, release the previous cache.
    * A previous cache over the SAME canonicalized plan (repeated call on the
    * same inputs — e.g. a benchmark's best-of-2) is NOT unpersisted: the
    * cache manager holds one entry per canonical plan, so unpersisting the
    * old handle would evict the entry the new handle just re-registered,
    * silently recomputing the whole subplan on every call. */
  def swap(df: DataFrame,
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    val cached = df.persist(level)
    cached.count()
    val old = ref.getAndSet(cached)
    if (old != null && (old ne cached) &&
        !old.queryExecution.analyzed.sameResult(cached.queryExecution.analyzed))
      old.unpersist(blocking = false)
    cached
  }

  /** Unpersist and drop the held cache, if any. Call at pipeline end so the
    * last band/shingle/assignment table doesn't stay pinned for the JVM
    * lifetime (round-2 ADVICE). Safe to call concurrently with swap(): the
    * atomic getAndSet hands each frame to exactly one releaser. */
  def release(): Unit = {
    val old = ref.getAndSet(null)
    if (old != null) old.unpersist(blocking = false)
  }
}
