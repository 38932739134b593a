package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, CreateStruct, GenericInternalRow, JoinedRow,
  RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.execution.metric.SQLMetrics

/** Physical as-of join: a streaming merge over the two KEY-clustered,
  * (key, time)-sorted children — the canonical market-data/feature-
  * store algorithm, expressed as a first-class Spark operator.
  *
  * Execution shape (the 100 TB argument):
  *
  *  - `requiredChildDistribution` asks for ClusteredDistribution on
  *    each side's keys — EnsureRequirements co-partitions the children
  *    exactly as it does for sort-merge joins (same mechanism as
  *    Spark's own CoGroupExec, so AQE partition coalescing stays
  *    consistent across both shuffles). Each input crosses the wire
  *    ONCE, at its own schema width — not the union+window
  *    formulation's combined width.
  *  - `requiredChildOrdering` asks for (keys, time) ascending on the
  *    left and (keys, time, tieBreak) ascending on the right, so the
  *    planner's SortExec (or an already-sorted child, e.g. a bucketed
  *    sorted store) provides the merge order for free.
  *  - `doExecute` zips co-partitions and walks both iterators once,
  *    holding exactly ONE candidate payload row (the latest right row
  *    at-or-before the current left row's time for the current key) —
  *    O(1) state, no per-key partition buffering, nothing to spill.
  *    Ascending nulls-first order makes the semantics line up with the
  *    composed operator for free: null left times sort before every
  *    timestamped right row of their key and so match nothing; equal
  *    times are consumed inclusively (<=); the tieBreak sort means the
  *    last consumed tie is the max-tieBreak winner.
  *
  * Output rows reuse the projection buffer per the usual SparkPlan
  * iterator contract (consumers copy if they buffer). Rows held across
  * iterator steps (`heldKey`, `heldPayload`) are copies — the child
  * sort reuses ITS row buffers.
  *
  * AsofJoinSpec pins native == composed on randomized hot-key data and
  * the two-exchange/no-union plan shape; q126 runs it under q73's
  * DuckDB oracle.
  */
case class AsofJoinExec(
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
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime :+ tieBreak).map(SortOrder(_, Ascending)))

  // one left row in, one out, order preserved — partitioning and
  // ordering pass straight through (a downstream per-key aggregation
  // re-uses the exchange)
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    val lOut = left.output
    val rOut = right.output
    val (lk_, rk_, lt_, rt_, pay_, asof_) =
      (leftKeys, rightKeys, leftTime, rightTime, payload, asofOut)
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      if (!lIter.hasNext) Iterator.empty
      else {
        val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
        val timeOrd =
          RowOrdering.createNaturalAscendingOrdering(Seq(timeType))
        val lKeyProj = UnsafeProjection.create(lk_, lOut)
        val rKeyProj = UnsafeProjection.create(rk_, rOut)
        val lTimeProj = UnsafeProjection.create(Seq(lt_), lOut)
        val rTimeProj = UnsafeProjection.create(Seq(rt_), rOut)
        val payloadProj =
          UnsafeProjection.create(Seq(CreateStruct(pay_)), rOut)
        val outProj =
          UnsafeProjection.create(lOut :+ asof_, lOut :+ asof_)
        val nullPayload = new GenericInternalRow(1)
        val joined = new JoinedRow
        var rRow: InternalRow = if (rIter.hasNext) rIter.next() else null
        var heldKey: UnsafeRow = null
        var heldPayload: UnsafeRow = null
        lIter.map { l =>
          val lk = lKeyProj(l)
          val lt = lTimeProj(l)
          var advancing = true
          while (advancing && rRow != null) {
            val c = keyOrd.compare(rKeyProj(rRow), lk)
            if (c < 0 ||
                (c == 0 && timeOrd.compare(rTimeProj(rRow), lt) <= 0)) {
              if (c == 0) {
                // latest at-or-before so far for this key: keep it
                // (copies — the child iterator reuses its buffers)
                heldKey = rKeyProj(rRow).copy()
                heldPayload = payloadProj(rRow).copy()
              }
              rRow = if (rIter.hasNext) rIter.next() else null
            } else advancing = false
          }
          val p =
            if (heldPayload != null && keyOrd.compare(heldKey, lk) == 0)
              heldPayload
            else nullPayload
          numOutputRows += 1
          outProj(joined(l, p))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}
