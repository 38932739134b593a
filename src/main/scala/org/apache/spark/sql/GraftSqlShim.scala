package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column↔Expression converters that
  * Spark 4 moved behind `org.apache.spark.sql.classic.ExpressionUtils`
  * (columnNodeSupport.scala). Our custom Catalyst expressions
  * (graft.functions) need exactly these two hops and nothing else from
  * the internal API.
  */
object GraftSqlShim {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
