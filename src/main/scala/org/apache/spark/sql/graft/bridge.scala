package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's `private[sql]` Column↔Expression conversion, needed
  * to expose custom Catalyst expressions through the public Column API
  * (Spark 4 removed the public `new Column(expr)` constructor). Lives in
  * the org.apache.spark.sql namespace solely to satisfy the access
  * qualifier — the standard pattern for Spark extension libraries.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
