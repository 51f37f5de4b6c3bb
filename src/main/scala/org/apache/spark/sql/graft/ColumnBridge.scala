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

  /** Build a DataFrame from a raw [[org.apache.spark.sql.catalyst.plans
    * .logical.LogicalPlan]] (`Dataset.ofRows` is `private[sql]`) — the
    * entry point a custom logical operator needs to hand its plan back
    * to the session. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Apply a [[org.apache.spark.sql.SparkSessionExtensions]]' injected
    * functions to a registry (`registerFunctions` is `private[sql]`);
    * lets tests drive the `spark.sql.extensions` wiring without building
    * a fresh SparkContext. */
  def applyInjectedFunctions(
      ext: org.apache.spark.sql.SparkSessionExtensions,
      registry: org.apache.spark.sql.catalyst.analysis.FunctionRegistry): Unit =
    ext.registerFunctions(registry)
}
