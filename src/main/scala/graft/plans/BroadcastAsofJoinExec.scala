package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Attribute, CreateStruct, GenericInternalRow, JoinedRow, RowOrdering,
  SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.physical.{
  BroadcastDistribution, Distribution, IdentityBroadcastMode,
  Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.execution.metric.SQLMetrics

/** Broadcast as-of join: the dimension-sized-right twin of
  * [[AsofJoinExec]] — same semantics (latest right row at-or-before
  * each left row's time per key, max-tieBreak tie winner, left-outer),
  * chosen by [[AsofJoinStrategy]] when the right side fits the
  * broadcast threshold (or the caller forces it).
  *
  * Why it exists (the 100 TB argument): the streaming-merge exec asks
  * for ClusteredDistribution on BOTH children, so an as-of lookup of a
  * 100 TB fact stream against a dimension-sized state table (the
  * canonical feature-store shape: prices, account status, config
  * history) pays a full shuffle + sort of the FACT side. This exec
  * asks for nothing from the left child and a broadcast of the right:
  * the fact side is never exchanged or sorted — the same plan-shape
  * win broadcast-hash-join has over sort-merge-join, carried to the
  * as-of semantics. Partitioning and ordering pass through, so
  * downstream operators reuse whatever layout the scan already had.
  *
  * Per partition, the broadcast rows build a key → (times, payloads)
  * index once — candidates sorted by (time, tieBreak) ascending — and
  * each left row answers with one hash probe + a binary search for the
  * last time <= leftTime (ties land on the max tieBreak because equal
  * times sort by tieBreak and upper-bound takes the last). Null right
  * times are dropped at build (cannot satisfy <=); a null left time
  * matches nothing (ascending-null-first comparator puts it before
  * every real time). Build cost is O(R log R) per task over
  * broadcast-sized R — the same trade Spark's own
  * BroadcastNestedLoopJoin makes with identity-mode broadcasts.
  *
  * AsofJoinSpec pins broadcast == merge == composed on randomized
  * hot-key data and the zero-left-exchange plan shape; q127 runs it
  * under q73's DuckDB oracle.
  */
case class BroadcastAsofJoinExec(
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    tieBreak: Attribute,
    payload: Seq[Attribute],
    asofOut: Attribute,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output :+ asofOut

  override lazy val metrics = Map(
    "numOutputRows" ->
      SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution ::
      BroadcastDistribution(IdentityBroadcastMode) :: Nil

  // one left row in, one out, order preserved — the fact side's
  // layout survives the operator untouched
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val broadcastRows = right.executeBroadcast[Array[InternalRow]]()
    val lOut = left.output
    val rOut = right.output
    val (lk_, rk_, lt_, rt_, tie_, pay_, asof_) =
      (leftKeys, rightKeys, leftTime, rightTime, tieBreak, payload, asofOut)
    left.execute().mapPartitions { lIter =>
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(
        Seq(lt_.dataType))
      val sortOrd = RowOrdering.createNaturalAscendingOrdering(
        Seq(rt_.dataType, tie_.dataType))
      val rKeyProj = UnsafeProjection.create(rk_, rOut)
      val rTimeProj = UnsafeProjection.create(Seq(rt_), rOut)
      val rSortProj = UnsafeProjection.create(Seq(rt_, tie_), rOut)
      val payloadProj =
        UnsafeProjection.create(Seq(CreateStruct(pay_)), rOut)
      // key → candidates sorted ascending by (time, tieBreak); the
      // times array is the binary-search axis, payloads align with it
      val index =
        mutable.HashMap.empty[UnsafeRow,
          (Array[UnsafeRow], Array[UnsafeRow])]
      locally {
        val grouped = mutable.HashMap.empty[UnsafeRow,
          mutable.ArrayBuffer[(UnsafeRow, UnsafeRow, UnsafeRow)]]
        broadcastRows.value.foreach { r =>
          val t = rTimeProj(r)
          if (!t.isNullAt(0)) {
            grouped.getOrElseUpdate(rKeyProj(r).copy(),
                mutable.ArrayBuffer.empty) +=
              ((rSortProj(r).copy(), t.copy(), payloadProj(r).copy()))
          }
        }
        grouped.foreach { case (k, buf) =>
          val sorted = buf.sortWith((a, b) => sortOrd.compare(a._1, b._1) < 0)
          index(k) = (sorted.map(_._2).toArray, sorted.map(_._3).toArray)
        }
      }
      val lKeyProj = UnsafeProjection.create(lk_, lOut)
      val lTimeProj = UnsafeProjection.create(Seq(lt_), lOut)
      val outProj = UnsafeProjection.create(lOut :+ asof_, lOut :+ asof_)
      val nullPayload = new GenericInternalRow(1)
      val joined = new JoinedRow
      lIter.map { l =>
        val p = index.get(lKeyProj(l)) match {
          case Some((times, payloads)) =>
            val lt = lTimeProj(l)
            // upper bound: last index with times(i) <= lt
            var lo = 0
            var hi = times.length - 1
            var hit = -1
            while (lo <= hi) {
              val mid = (lo + hi) >>> 1
              if (timeOrd.compare(times(mid), lt) <= 0) {
                hit = mid; lo = mid + 1
              } else hi = mid - 1
            }
            if (hit >= 0) payloads(hit) else nullPayload
          case None => nullPayload
        }
        numOutputRows += 1
        outProj(joined(l, p))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastAsofJoinExec =
    copy(left = newLeft, right = newRight)
}
