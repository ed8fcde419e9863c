package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge for the engine's custom Catalyst expressions.
  * Spark 4 made these conversions `private[sql]`; exposing them from a
  * sql-subpackage is the standard extension pattern for third-party
  * expression libraries. */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
