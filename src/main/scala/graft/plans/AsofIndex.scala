package graft.plans

import java.util.concurrent.Callable
import java.util.concurrent.atomic.AtomicLong

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Attribute, CreateStruct, RowOrdering, UnsafeProjection, UnsafeRow}

/** The probe structure behind [[BroadcastAsofJoinExec]]: per key, the
  * candidates sorted ascending by (time, tieBreak) — `times` as the
  * binary-search axis, payload structs aligned with it. Built from the
  * broadcast dimension rows on the executor, ONCE per executor per
  * broadcast (see [[AsofIndex.forBroadcast]]), never per task.
  *
  * Why not build it inside the broadcast exchange (the HashedRelation
  * lifecycle, where the broadcast VALUE is the built structure):
  * BroadcastExchangeExec sizes its relation through a sealed match —
  * HashedRelation (sealed, not implementable from a library) or
  * Array[InternalRow], anything else throws — so a library operator's
  * broadcast value must stay the row array. The executor-side
  * memoization below recovers the property that matters at scale: a
  * fact-side stage with thousands of tasks per executor groups and
  * sorts the dimension once, not per task.
  */
final class AsofIndex(
    private val index: java.util.HashMap[UnsafeRow, AsofIndex.Entry]) {
  /** The key's candidates, or null when the key was never seen. */
  def entry(key: UnsafeRow): AsofIndex.Entry = index.get(key)
}

object AsofIndex {
  /** Candidates of one key, ascending by (time, tieBreak). */
  final case class Entry(times: Array[UnsafeRow], payloads: Array[UnsafeRow])

  /** Executor-local share: one built index per live broadcast, keyed
    * by broadcast id. Values are weak — the cache never pins memory
    * beyond the tasks (and small id-keyed map) that hold the index;
    * after they release it, GC may reclaim and a later task rebuilds.
    * Guava's loading `get` serializes concurrent builders of the same
    * key, so simultaneous first tasks build exactly once. */
  private val shared =
    com.google.common.cache.CacheBuilder.newBuilder()
      .weakValues()
      .build[java.lang.Long, AsofIndex]()

  /** Observability hook for the build-once contract (AsofJoinSpec
    * pins: many fact partitions, one build per broadcast). */
  private[graft] val buildCount = new AtomicLong(0L)

  def forBroadcast(
      broadcastId: Long,
      rows: Array[InternalRow],
      rightOutput: Seq[Attribute],
      rightKeys: Seq[Attribute],
      rightTime: Attribute,
      tieBreak: Attribute,
      payload: Seq[Attribute]): AsofIndex =
    shared.get(broadcastId, new Callable[AsofIndex] {
      override def call(): AsofIndex =
        build(rows, rightOutput, rightKeys, rightTime, tieBreak, payload)
    })

  /** Group by key and sort each group's candidates by (time,
    * tieBreak). Null-time rows are dropped (they cannot satisfy
    * `rightTime <= leftTime`; the DataFrame API also filters them —
    * this keeps direct plan construction honest). All held rows are
    * copies: the broadcast array's rows are shared across threads. */
  private def build(
      rows: Array[InternalRow],
      rightOutput: Seq[Attribute],
      rightKeys: Seq[Attribute],
      rightTime: Attribute,
      tieBreak: Attribute,
      payload: Seq[Attribute]): AsofIndex = {
    buildCount.incrementAndGet()
    val keyProj = UnsafeProjection.create(rightKeys, rightOutput)
    val timeProj = UnsafeProjection.create(Seq(rightTime), rightOutput)
    val sortProj =
      UnsafeProjection.create(Seq(rightTime, tieBreak), rightOutput)
    val payloadProj =
      UnsafeProjection.create(Seq(CreateStruct(payload)), rightOutput)
    val sortOrd = RowOrdering.createNaturalAscendingOrdering(
      Seq(rightTime.dataType, tieBreak.dataType))
    val grouped = mutable.HashMap.empty[UnsafeRow,
      mutable.ArrayBuffer[(UnsafeRow, UnsafeRow, UnsafeRow)]]
    rows.foreach { r =>
      val t = timeProj(r)
      if (!t.isNullAt(0)) {
        grouped.getOrElseUpdate(keyProj(r).copy(),
            mutable.ArrayBuffer.empty) +=
          ((sortProj(r).copy(), t.copy(), payloadProj(r).copy()))
      }
    }
    val index =
      new java.util.HashMap[UnsafeRow, Entry](grouped.size * 2)
    grouped.foreach { case (k, buf) =>
      val sorted = buf.sortWith((a, b) => sortOrd.compare(a._1, b._1) < 0)
      index.put(k, Entry(sorted.map(_._2).toArray, sorted.map(_._3).toArray))
    }
    new AsofIndex(index)
  }
}
