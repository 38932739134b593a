package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Similarity

/** Streaming EMBEDDING near-dup — the vector-side mirror of
  * [[EventStreams.nearDupDocStream]]: incoming vectors register in L
  * independent hyperplane-LSH tables (the PORTABLE plane family, so
  * state code can recompute any vector's buckets in plain JVM
  * arithmetic), state lives per (table, bucket), and a new vector is
  * exact-cosine-verified only against its buckets' retained vectors.
  *
  * Multi-table recall: one 8-plane table catches a cos >= 0.9 pair
  * with p = (1 - θ/π)^8 ≈ 0.3; L independent tables lift that to
  * 1-(1-p)^L (L = 8 → ≈ 0.94), the standard streaming-LSH recall
  * dial — and EXACT duplicates collide in every table, so they are
  * never missed while retained. The batch operators
  * ([[graft.operators.EmbeddingDedup]]) remain the exactness
  * backstop, mirroring the text stream's eviction-miss contract.
  *
  * Suppression: a pair colliding in several tables emits ONCE — only
  * the lowest colliding table emits, each bucket recomputing both
  * vectors' buckets in-JVM (no extra shuffle or state, same scheme as
  * the text stream's band-local suppression). Same eviction-miss
  * contract too: if the LOWEST colliding table evicted the older
  * vector while a higher table still retains it, the higher table
  * suppresses and the pair is missed in-stream (the text stream's
  * recovery comes from an independent second sketch family; here the
  * batch job is the backstop — StreamingSpec pins both halves).
  *
  * State per bucket: FIFO-capped list of (vec_id, vector) —
  * `maxPerBucket` bounds a hot bucket (near-dup floods, zero
  * vectors); `stateTtlMs` expires idle buckets so TOTAL state tracks
  * the active working set. Determinism: each micro-batch's bucket
  * members are processed in vec_id order.
  */
object VectorStreams {

  case class SketchedVec(table_id: Int, bucket: Long, vec_id: Long,
      vec: Seq[Float])
  case class VecDupHit(vec_id: Long, dup_of: Long, cos: Double)

  def nearDupVecStream(
      vecs: DataFrame,
      threshold: Double = 0.9,
      tables: Int = 8,
      nPlanes: Int = 8,
      maxPerBucket: Int = 64,
      stateTtlMs: Long = 0L): Dataset[VecDupHit] = {
    import vecs.sparkSession.implicits._
    val keyed = vecs
      .select(col("vec_id"), col("embedding"),
        explode(sequence(lit(0), lit(tables - 1))).as("t"))
      .select(col("t").cast("int").as("table_id"),
        Similarity.portableLshBucket(col("embedding"), nPlanes, col("t"))
          .as("bucket"),
        col("vec_id"), col("embedding").as("vec"))
      .as[SketchedVec]
    val timeoutConf =
      if (stateTtlMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    keyed
      .groupByKey(v => (v.table_id, v.bucket))
      .flatMapGroupsWithState[List[(Long, Seq[Float])], VecDupHit](
        OutputMode.Append, timeoutConf) {
        (key, batch: Iterator[SketchedVec],
            state: GroupState[List[(Long, Seq[Float])]]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            // lowest colliding table emits: recompute both vectors'
            // buckets in-JVM (bit-identical plane family); a lower
            // table that EVICTED the older vector never sees the pair
            // and this group still suppresses — the documented
            // eviction-miss contract, batch job as backstop
            def firstCollidingTable(a: Seq[Float], b: Seq[Float]): Int =
              (0 until tables).find { t =>
                Similarity.portableLshBucketJvm(a, nPlanes, t) ==
                  Similarity.portableLshBucketJvm(b, nPlanes, t)
              }.getOrElse(key._1)
            var seen = state.getOption.getOrElse(Nil)
            val hits = List.newBuilder[VecDupHit]
            batch.toSeq.sortBy(_.vec_id).foreach { v =>
              seen.foreach { case (prevId, prevVec) =>
                if (prevId != v.vec_id) {
                  val c = Similarity.cosineJvm(prevVec, v.vec)
                  if (c >= threshold &&
                      firstCollidingTable(prevVec, v.vec) == key._1)
                    hits += VecDupHit(v.vec_id, prevId,
                      math.rint(c * 1e6) / 1e6)
                }
              }
              seen = ((v.vec_id, v.vec) :: seen).take(maxPerBucket)
            }
            state.update(seen)
            if (stateTtlMs > 0) state.setTimeoutDuration(stateTtlMs)
            hits.result().iterator
          }
      }
  }

  /** Streaming face of the stored-landmark drift monitor
    * ([[graft.operators.Coreset.assignBatchToStored]]): every
    * incoming vector is probed against the persisted k-center
    * landmark index — a STATELESS narrow projection (the k landmark
    * rows are collected from the static store once at plan time and
    * ride as literals), so it imposes no state store, no shuffle, and
    * no watermark on the stream. Emits (vec_id, lm_id, lm_rank, dist,
    * radius, novel) per vector; a foreachBatch aggregation of
    * avg(novel) is the live distribution-shift signal. */
  def driftStream(vecs: DataFrame, landmarks: DataFrame): DataFrame =
    graft.operators.Coreset.assignBatchToStored(
      vecs, "vec_id", "embedding", landmarks)
}
