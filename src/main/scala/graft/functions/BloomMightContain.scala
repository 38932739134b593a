package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_might_contain(hash)` — membership probe against a
  * pre-built [[org.apache.spark.util.sketch.BloomFilter]] carried in
  * the expression as its serialized bytes. Spark's own
  * BloomFilterMightContain is not registered on the public SQL
  * surface (UNRESOLVED_ROUTINE in 4.1), so this is a native codegen'd
  * expression over the PUBLIC sketch API instead of a UDF. The filter
  * deserializes once per executor (`@transient lazy`), and codegen
  * references the deserialized filter object directly — the probe is
  * one or two cache-line reads inside whole-stage codegen, no
  * per-row deserialization or boxing.
  *
  * The intended shape (see `operators.Decontaminate`): a huge
  * exploded frame is pruned by this NARROW filter before its first
  * shuffle; false positives are then removed by an exact confirm
  * join whose input is already tiny, so the overall operator stays
  * exact while the bloom bounds what crosses the wire.
  */
case class BloomMightContain(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain needs bigint, got ${other.catalogString}")
    }

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(filterBytes))

  override def nullSafeEval(v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", bloom,
      classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "bloom_might_contain"
}

object BloomMightContain {
  def bloomMightContain(hash: Column, filter: BloomFilter): Column = {
    import org.apache.spark.sql.GraftSqlShim._
    val out = new java.io.ByteArrayOutputStream()
    filter.writeTo(out)
    toColumn(BloomMightContain(toExpression(hash), out.toByteArray))
  }
}
