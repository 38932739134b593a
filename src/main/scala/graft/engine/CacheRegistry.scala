package graft.engine

import org.apache.spark.sql.Dataset

/** Tracks DataFrames persisted inside operators whose results are
  * returned lazily (the sketch tables of [[graft.operators.Dedup]] et
  * al.), so long-lived sessions — the library API, Verify — can release
  * them after the returned plan is materialized instead of letting
  * cached blocks accumulate until LRU pressure. Bench's per-run
  * `clearCache()` subsumes this; other callers should invoke
  * [[releaseAll]] once per materialized query, or wrap the query in
  * [[withRetained]] which releases on exit automatically.
  *
  * Scope: the registry is process-global, sized for the library's
  * one-query-at-a-time session model (Verify, Bench, the Api entry
  * points). Concurrent queries in one JVM would release each other's
  * caches — an unpersisted frame silently recomputes (correct, just
  * slower), so interleave [[releaseAll]] / [[withRetained]] only at
  * real query boundaries.
  *
  * The registry holds STRONG references on purpose. Spark's
  * CacheManager keys cache entries by logical plan and holds the
  * InMemoryRelation strongly, so letting the Dataset wrapper be
  * GC'd would NOT free the cached blocks — it would only lose the
  * handle needed to unpersist them (a prior weak-reference design
  * failed exactly this way: a frame collected between `retain` and
  * `releaseAll` leaked its blocks until LRU eviction). Holding the
  * wrapper strongly pins nothing beyond what the CacheManager
  * already pins, and guarantees [[releaseAll]] can always unpersist.
  * The buffer is bounded by retains since the last release — one
  * query's worth under the session model above.
  */
object CacheRegistry {
  private val frames = scala.collection.mutable.ArrayBuffer[Dataset[_]]()

  /** Persist `df` (MEMORY_AND_DISK) and remember it for [[releaseAll]]. */
  def retain[T](df: Dataset[T]): Dataset[T] = synchronized {
    df.persist()
    frames += df
    df
  }

  /** Unpersist every retained frame (non-blocking) and forget all. */
  def releaseAll(): Unit = synchronized {
    frames.foreach(_.unpersist(false))
    frames.clear()
  }

  /** Run `body`, then unpersist exactly the frames retained DURING it
    * (even on exception). Nested scopes release inner-first; frames
    * retained before entry are left for the enclosing scope or a later
    * [[releaseAll]]. This closes the retain-then-forget leak class:
    * operators keep calling [[retain]] unscoped, callers wrap each
    * query and never need to know which operators cache internally. */
  def withRetained[A](body: => A): A = {
    val mark = synchronized { frames.length }
    try body
    finally synchronized {
      // releaseAll() inside the body may have shrunk the buffer below
      // the mark; release only what is still ours.
      if (frames.length > mark) {
        frames.drop(mark).foreach(_.unpersist(false))
        frames.remove(mark, frames.length - mark)
      }
    }
  }

  /** Retained-frame count — for specs. */
  def liveCount: Int = synchronized { frames.length }
}
