package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `org.apache.spark.sql`-private Column↔Expression conversion
  * (Spark 4 hides `new Column(expr)` behind `classic.ExpressionUtils`,
  * which is `private[sql]`). The standard extension-library pattern: a
  * one-line forwarder living in the sql package. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
