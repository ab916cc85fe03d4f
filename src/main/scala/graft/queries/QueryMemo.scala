package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped materialized-frame memo shared by the query objects: a
  * subplan several queries consume (LSH candidates, the train/test shingle
  * table, the unigram-scored corpus) is persisted, counted, and handed back
  * as the SAME DataFrame handle on every call, so repeat consumers skip the
  * plan rebuild AND the per-call persist/count handshake (each re-walk pays
  * a count job per cached subplan — measurable when a benchmark calls three
  * sibling queries back-to-back).
  *
  * Keys include the session and the sf dir: a fresh session rebuilds, a
  * stopped session's entries are inert. Entries drop with [[release]] —
  * Bench's explicit unpin step — so executor storage isn't pinned for the
  * JVM lifetime; already-returned frames recompute from lineage if re-read.
  *
  * get/put run under a REENTRANT lock, not `computeIfAbsent`: builds nest
  * (a cached frame's build may consume another cached frame on the same
  * map), and a mapping function that mutates its own ConcurrentHashMap is
  * forbidden — same-bin nesting throws "Recursive update". */
private[queries] final class QueryMemo {
  private val persisted =
    new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()
  private val memo = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String, String), DataFrame]()

  def apply(name: String, s: SparkSession, d: String)(
      build: => DataFrame): DataFrame = {
    val key = (s, d, name)
    val hit = memo.get(key)
    if (hit != null) return hit
    memo.synchronized {
      val again = memo.get(key)
      if (again != null) return again
      val df = build.persist()
      persisted.add(df)
      df.count() // materialize before fan-out: concurrent broadcast +
                 // shuffle consumers of an unmaterialized cache would
                 // each recompute
      memo.put(key, df)
      df
    }
  }

  /** Unpersist every cached frame and forget the keys. */
  def release(): Unit = {
    memo.clear()
    var df = persisted.poll()
    while (df != null) {
      df.unpersist()
      df = persisted.poll()
    }
  }
}
