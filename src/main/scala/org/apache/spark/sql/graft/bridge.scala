package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Narrow `private[sql]` bridge for [[graft.plans.SqlMerge]]: a Column
  * view of a resolved Catalyst expression and a DataFrame view of a
  * logical plan — the two hooks a plan-level command executor needs to
  * hand analyzer-resolved expressions back to the public DataFrame
  * algebra. Nothing else from the internal API is re-exported.
  */
object bridge {
  def columnOf(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  def dataFrameOf(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
