package graft.engine

import org.apache.spark.sql.{Column, DataFrame}

/** The AQE one-task candidate-explosion trap, fixed in ONE place.
  *
  * Shape: a probe/query side that is small BEFORE a join but whose
  * join output is candidate-scale (sparse top-k postings, IVF cell
  * pairing — any join that multiplies rows). AQE sizes the
  * post-shuffle partition count from the map-side INPUT bytes, sees a
  * few hundred KB, coalesces to one partition — and the entire ~cap×
  * blow-up plus its per-candidate verification runs in a single task
  * (measured twice at sf0.1 before this helper existed: one 6.6 s
  * task carrying 85% of q114; one 1.2 s task carrying ~70% of q82).
  *
  * The fix is an explicit pinned-width hash repartition on the
  * explosion key. It matters at BOTH ends: (a) the pre-join exchange
  * is forced to the full configured task width, so the explosion runs
  * map-side across every core at any scale and the co-partitioned
  * build side follows it; (b) hashing on the key that later stages
  * group/window by means NOTHING after the explosion shuffles — the
  * clustering already satisfies their distribution requirements.
  *
  * Use on the probe side immediately before the multiplying join,
  * keyed by the column(s) the downstream aggregation/window partition
  * on. Do NOT use where the join output is input-sized — there the
  * extra shuffle is pure cost (measured on the merge path:
  * Tables.spread's docstring carries that warning for scans).
  */
object Spread {
  def spreadForExplosion(df: DataFrame, keys: Column*): DataFrame =
    df.repartition(
      df.sparkSession.sessionState.conf.numShufflePartitions, keys: _*)
}
