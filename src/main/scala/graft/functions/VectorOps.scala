package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{
  CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native vector arithmetic for the similarity-search hot path. The
  * `zip_with`+`aggregate` formulation evaluates interpreted with
  * per-element boxing — a 64-dim dot product costs ~128 virtual calls;
  * these do one tight primitive loop per row.
  *
  * [[DotProductExpr]] and [[HammingBytesExpr]] additionally implement
  * `doGenCode` (the same loop emitted into the generated stage), so
  * the candidate-verification projections they sit in — the
  * per-PAIR hot paths of the cosine index and the perceptual-hash
  * search, millions of evaluations per query at scale — stay inside
  * whole-stage codegen instead of breaking the span with a boxed
  * fallback `eval` call per row. [[ShinglesExpr]] stays a fallback
  * deliberately: it runs once per document (not per pair) and its
  * string/LinkedHashSet work dwarfs the call overhead.
  *
  * Semantics are IDENTICAL to the Column formulation the DuckDB oracle
  * mirrors: every float is promoted to double before multiplication
  * and the sum folds left-to-right in index order, so results are
  * bit-for-bit equal and rank tie-breaks stay stable (the generated
  * and interpreted loops are the same arithmetic — DedupSpec pins
  * codegen == interpreted).
  */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"dot_product needs two array<float>, got $other")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)
  override def prettyName: String = "dot_product"
}

/** w-word shingles from a token array — the tokenize→shingle step done
  * in one pass (distinct, insertion order like array_distinct). Short
  * texts fall back to one whole-text shingle, matching
  * operators.Dedup.shingles. */
case class ShinglesExpr(child: Expression, w: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"shingles needs array<string>, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    def tok(i: Int): String =
      if (arr.isNullAt(i)) "" else arr.getUTF8String(i).toString
    val out = new java.util.LinkedHashSet[String]()
    if (n >= w) {
      var i = 0
      while (i <= n - w) {
        val sb = new java.lang.StringBuilder(tok(i))
        var o = 1
        while (o < w) { sb.append(' ').append(tok(i + o)); o += 1 }
        out.add(sb.toString)
        i += 1
      }
    } else {
      val sb = new java.lang.StringBuilder()
      var i = 0
      while (i < n) {
        if (i > 0) sb.append(' ')
        sb.append(tok(i)); i += 1
      }
      out.add(sb.toString)
    }
    val it = out.iterator()
    val res = new Array[Any](out.size)
    var i = 0
    while (it.hasNext) { res(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(res)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "shingles"
}

/** Bit-level Hamming distance between two binary values (xor-popcount
  * over the shared length; length difference counts 8 bits per extra
  * byte). Serves the perceptual-hash near-dup search (HammingSearch). */
case class HammingBytesExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hamming_bytes needs two binary, got $other")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[Array[Byte]]
    val b = r.asInstanceOf[Array[Byte]]
    val n = math.min(a.length, b.length)
    var d = 0
    var i = 0
    while (i < n) {
      d += java.lang.Integer.bitCount((a(i) ^ b(i)) & 0xff)
      i += 1
    }
    d + (math.abs(a.length - b.length) * 8)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.length, $b.length);
         |int $d = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $d += java.lang.Integer.bitCount(($a[$i] ^ $b[$i]) & 0xff);
         |}
         |${ev.value} =
         |  $d + java.lang.Math.abs($a.length - $b.length) * 8;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)
  override def prettyName: String = "hamming_bytes"
}

object VectorOps {
  import org.apache.spark.sql.GraftSqlShim._

  def dotProduct(a: Column, b: Column): Column =
    toColumn(DotProductExpr(toExpression(a), toExpression(b)))

  def shingles(tokens: Column, w: Int): Column =
    toColumn(ShinglesExpr(toExpression(tokens), w))

  def hammingBytes(a: Column, b: Column): Column =
    toColumn(HammingBytesExpr(toExpression(a), toExpression(b)))
}
