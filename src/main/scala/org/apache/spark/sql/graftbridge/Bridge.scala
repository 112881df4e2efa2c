package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression <-> LogicalPlan bridge.
  *
  * Spark 4 moved `Column.expr` / `Column(expr)` / `Dataset.ofRows` behind
  * `private[sql]` (the Connect-compatible Column is a ColumnNode wrapper).
  * Extension libraries that build Catalyst plans — exactly what this engine's
  * custom-operator layer does — still need the classic bridge, so this object
  * lives in an `org.apache.spark.sql` subpackage to reach the qualified-
  * private API, and is the ONLY place in the codebase allowed to do so.
  */
object Bridge {

  /** The Catalyst expression behind a (classic) Column. */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap a Catalyst expression as a Column. */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** If `c` is a sort-order column (`desc("x")` / `asc("x")`), its child
    * value column; otherwise `c` itself. Matches on the ColumnNode —
    * `expression(c)` wraps the node lazily, so a Catalyst-level match
    * would not see the SortOrder until analysis. */
  def unwrapSortOrder(c: Column): Column = c.node match {
    case so: org.apache.spark.sql.internal.SortOrder => Column(so.child)
    case _ => c
  }

  /** The analyzed logical plan of a DataFrame. */
  def logicalPlan(df: DataFrame): LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].logicalPlan

  /** Build a DataFrame from a logical plan. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
