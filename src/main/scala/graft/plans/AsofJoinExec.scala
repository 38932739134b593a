package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, BoundReference, GenericInternalRow, JoinedRow,
  SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.codegen.{
  CodegenContext, ExprCode, JavaCode}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{
  BinaryExecNode, CodegenSupport, SparkPlan}
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
  *  - Both execution paths walk the co-partitions once through ONE
  *    shared kernel ([[AsofMerger]]), holding exactly ONE candidate
  *    payload row — O(1) state, no per-key partition buffering,
  *    nothing to spill. The null contract (null right times skipped,
  *    null left times match nothing) is enforced IN the kernel, same
  *    as [[AsofIndex.build]] on the broadcast path, so a directly
  *    constructed plan cannot diverge between physical paths.
  *  - The operator participates in WHOLE-STAGE CODEGEN the way
  *    SortMergeJoinExec does: `inputRDDs` exposes both sorted children
  *    (WholeStageCodegenExec zips two inputs), doProduce drives the
  *    left iterator and emits one kernel call per row, so
  *    as-of → downstream projection/filter compile into a single
  *    generated loop with no iterator boundary at the operator — the
  *    round-12 gap on the operator's hottest path. The iterator
  *    `doExecute` remains as the codegen-off fallback; AsofJoinSpec
  *    pins codegen == interpreted.
  *
  * Output rows reuse the projection buffer per the usual SparkPlan
  * iterator contract (consumers copy if they buffer — `needCopyResult`
  * is set for the generated path). Rows held across iterator steps
  * are copies — the child sort reuses ITS row buffers.
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
    right: SparkPlan,
    toleranceBound: Option[Attribute] = None)
    extends BinaryExecNode with CodegenSupport {

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

  /** The serializable merge recipe shared by both execution paths —
    * what ships to tasks instead of the plan node itself. */
  private def mergerSpec =
    AsofMergerSpec(left.output, right.output, leftKeys, rightKeys,
      leftTime, rightTime, payload, toleranceBound)

  // ---- iterator path (codegen off) ---------------------------------

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val lOut = left.output
    val spec = mergerSpec
    val asof_ = asofOut
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      if (!lIter.hasNext) Iterator.empty
      else {
        val merger = spec.newMerger(rIter)
        val outProj =
          UnsafeProjection.create(lOut :+ asof_, lOut :+ asof_)
        val holder = new GenericInternalRow(1)
        val joined = new JoinedRow
        lIter.map { l =>
          holder.update(0, merger.advance(l))
          numOutputRows += 1
          outProj(joined(l, holder))
        }
      }
    }
  }

  // ---- whole-stage codegen path -------------------------------------

  override def inputRDDs(): Seq[RDD[InternalRow]] =
    left.execute() :: right.execute() :: Nil

  // output rows are backed by the generated UnsafeRow writer's reused
  // buffer; a buffering parent must copy
  override def needCopyResult: Boolean = true

  override protected def doProduce(ctx: CodegenContext): String = {
    val leftInput = ctx.addMutableState("scala.collection.Iterator",
      "asofLeftInput", v => s"$v = inputs[0];")
    val specTerm = ctx.addReferenceObj("asofMergerSpec", mergerSpec,
      classOf[AsofMergerSpec].getName)
    // the right iterator is consumed ONLY by the merger (inputs[1] at
    // init time), mirroring doExecute's zipPartitions pairing
    val merger = ctx.addMutableState(classOf[AsofMerger].getName,
      "asofMerger", v => s"$v = $specTerm.newMerger(inputs[1]);")
    val leftRow = ctx.freshName("asofLeftRow")
    ctx.INPUT_ROW = leftRow
    ctx.currentVars = null
    val leftVars = left.output.zipWithIndex.map { case (a, i) =>
      BoundReference(i, a.dataType, a.nullable).genCode(ctx)
    }
    val matched = ctx.freshName("asofStruct")
    val asofIsNull = ctx.freshName("asofIsNull")
    val numOutputRows = metricTerm(ctx, "numOutputRows")
    val rowCls = "org.apache.spark.sql.catalyst.InternalRow"
    val asofEv = ExprCode(
      JavaCode.isNullVariable(asofIsNull),
      JavaCode.variable(matched, asofOut.dataType))
    s"""
       |while ($leftInput.hasNext()) {
       |  $rowCls $leftRow = ($rowCls) $leftInput.next();
       |  $rowCls $matched = $merger.advance($leftRow);
       |  boolean $asofIsNull = ($matched == null);
       |  $numOutputRows.add(1);
       |  ${consume(ctx, leftVars :+ asofEv)}
       |  if (shouldStop()) return;
       |}
     """.stripMargin
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}
