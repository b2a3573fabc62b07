package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge to Spark's `private[sql]` Dataset factory: build a DataFrame
  * from an already-constructed LogicalPlan. The engine needs it to PIN a
  * plan optimized under a temporarily-enabled opt-in rule
  * (graft.plans.RewriteIntervalJoin) into a Dataset, so the rewrite
  * survives the re-optimization that every later action performs after
  * the gating conf has been restored. Package placement is the same
  * technique Spark connector libraries use for `private[sql]` access; no
  * Spark internals are modified. */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Column ⇄ Catalyst Expression, for library code that must inspect a
    * caller-supplied Column (e.g. [[graft.ops.GlobalRank]] reading the
    * sort direction off a `col.desc`). Eagerly CONVERTS the column node
    * (ExpressionUtils.expression returns a lazy ColumnNodeExpression
    * wrapper that defeats pattern matching). */
  def expression(c: Column): catalyst.expressions.Expression =
    classic.ColumnNodeToExpressionConverter(c.node)
  def column(e: catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)
}
