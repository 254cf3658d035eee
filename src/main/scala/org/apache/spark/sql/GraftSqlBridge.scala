package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the sql-private Column ↔ Expression conversions (Spark 4
  * made Column node-backed; `classic.ExpressionUtils` is `private[sql]`).
  * This is the one sanctioned extension seam for libraries that define
  * native Catalyst expressions — everything else in graft stays outside
  * Spark's namespace.
  */
object GraftSqlBridge {
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
}
