package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** int64 → 8-byte big-endian binary — the reference packs fuzzysearch
  * dhash values with `struct.pack(">q", hash_int)`
  * (scripts/ingest/fuzzysearch/main.py:101) before storing them as
  * `bytea`. Spark has no builtin for this (SURVEY §2.6 F9), so it is a
  * native codegen'd Catalyst expression rather than a UDF.
  */
case class LongToBigEndianBinary(child: Expression)
    extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"long_to_big_endian_binary needs bigint, got ${other.catalogString}")
    }

  override def nullSafeEval(v: Any): Any =
    LongToBigEndianBinary.pack(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"java.nio.ByteBuffer.allocate(8).putLong($c).array()")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "long_to_big_endian_binary"
}

object LongToBigEndianBinary {
  def pack(v: Long): Array[Byte] =
    java.nio.ByteBuffer.allocate(8).putLong(v).array()

  def longToBigEndianBinary(c: Column): Column = {
    import org.apache.spark.sql.GraftSqlShim._
    toColumn(LongToBigEndianBinary(toExpression(c)))
  }
}
