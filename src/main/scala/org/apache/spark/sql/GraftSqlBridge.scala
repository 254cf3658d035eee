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

  /** Wrap a custom LogicalPlan as a DataFrame (classic.Dataset.ofRows is
    * private[sql]) — needed by operators that plan whole-node semantics
    * (e.g. graft.plans.TopKPerKey). */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan behind a DataFrame. */
  def planOf(df: Dataset[_]): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].logicalPlan

  /** EAGER Column → Expression conversion. `toExpression` can return a
    * lazy wrapper still holding `sql.internal` ColumnNodes — fine inside
    * Spark's own operators, but not serializable into task closures of
    * custom SparkPlans. This converts the node tree to pure catalyst
    * expressions up front. */
  def toEagerExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)
}
