package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Attribute, GenericInternalRow, JoinedRow, RowOrdering, SortOrder,
  UnsafeProjection}
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
  * The broadcast rows build a key → time-sorted-candidates probe index
  * ([[AsofIndex]]) ONCE PER EXECUTOR per broadcast — tasks share it
  * through an id-keyed weak cache, so a fact-side stage with thousands
  * of tasks never repeats the dimension group-and-sort (see AsofIndex's
  * scaladoc for why the build cannot live inside the exchange itself).
  * Each left row then answers with one hash probe plus a binary search
  * for the last rightTime <= leftTime (ties land on the max tieBreak
  * because equal times sort by tieBreak and upper-bound takes the
  * last). Null right times are dropped at build (cannot satisfy <=);
  * a null left time matches nothing (ascending-null-first comparator
  * puts it before every real time).
  *
  * AsofJoinSpec pins broadcast == merge == composed on randomized
  * hot-key data, the zero-left-exchange plan shape, and the
  * once-per-broadcast index build; q127 runs it under q73's DuckDB
  * oracle.
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
      val index = AsofIndex.forBroadcast(broadcastRows.id,
        broadcastRows.value, rOut, rk_, rt_, tie_, pay_)
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(
        Seq(lt_.dataType))
      val lKeyProj = UnsafeProjection.create(lk_, lOut)
      val lTimeProj = UnsafeProjection.create(Seq(lt_), lOut)
      val outProj = UnsafeProjection.create(lOut :+ asof_, lOut :+ asof_)
      val nullPayload = new GenericInternalRow(1)
      val joined = new JoinedRow
      lIter.map { l =>
        val e = index.entry(lKeyProj(l))
        val p = if (e == null) nullPayload else {
          val lt = lTimeProj(l)
          // upper bound: last index with times(i) <= lt
          var lo = 0
          var hi = e.times.length - 1
          var hit = -1
          while (lo <= hi) {
            val mid = (lo + hi) >>> 1
            if (timeOrd.compare(e.times(mid), lt) <= 0) {
              hit = mid; lo = mid + 1
            } else hi = mid - 1
          }
          if (hit >= 0) e.payloads(hit) else nullPayload
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
