package graft.engine

import org.apache.spark.sql.{DataFrame, Dataset}

/** Tracks DataFrames persisted inside operators whose results are
  * returned lazily (the sketch tables of [[graft.operators.Dedup]] et
  * al.), so long-lived sessions — the library API, Verify — can release
  * them after the returned plan is materialized instead of letting
  * cached blocks accumulate until LRU pressure. Bench's per-run
  * `clearCache()` subsumes this; other callers should invoke
  * [[releaseAll]] once per materialized query.
  *
  * Scope: the registry is process-global, sized for the library's
  * one-query-at-a-time session model (Verify, Bench, the Api entry
  * points). Concurrent queries in one JVM would release each other's
  * caches — an unpersisted frame silently recomputes (correct, just
  * slower), but interleave [[releaseAll]] only at real query
  * boundaries.
  *
  * The registry holds WEAK references: a caller who materializes an
  * operator's result and never calls [[releaseAll]] does not pin the
  * frame — once unreachable it is collected and its cache entries fall
  * back to ordinary LRU eviction, exactly as a plain `persist()`
  * would. Dead entries are pruned on every [[retain]], so the buffer
  * is bounded by the number of LIVE retained frames.
  */
object CacheRegistry {
  private val frames =
    scala.collection.mutable.ArrayBuffer[java.lang.ref.WeakReference[Dataset[_]]]()

  /** Persist `df` (MEMORY_AND_DISK) and remember it for [[releaseAll]].
    * The registry weakly references `df` ITSELF (not a wrapper), so the
    * entry stays live exactly as long as some plan/caller path does. */
  def retain[T](df: Dataset[T]): Dataset[T] = synchronized {
    df.persist()
    frames.filterInPlace(_.get != null)
    frames += new java.lang.ref.WeakReference[Dataset[_]](df)
    df
  }

  /** Unpersist every live retained frame (non-blocking), forget all.
    * A frame collected before release falls back to plain-persist()
    * semantics: its blocks stay until LRU eviction or clearCache. */
  def releaseAll(): Unit = synchronized {
    frames.foreach(r => Option(r.get).foreach(_.unpersist(false)))
    frames.clear()
  }

  /** Live retained-frame count (post-GC view) — for specs. */
  def liveCount: Int = synchronized { frames.count(_.get != null) }
}
