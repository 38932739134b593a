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
  */
object CacheRegistry {
  private val frames = scala.collection.mutable.ArrayBuffer[DataFrame]()

  /** Persist `df` (MEMORY_AND_DISK) and remember it for [[releaseAll]]. */
  def retain[T](df: Dataset[T]): Dataset[T] = synchronized {
    df.persist()
    frames += df.toDF()
    df
  }

  /** Unpersist every retained frame (non-blocking) and forget them. */
  def releaseAll(): Unit = synchronized {
    frames.foreach(_.unpersist(false))
    frames.clear()
  }
}
