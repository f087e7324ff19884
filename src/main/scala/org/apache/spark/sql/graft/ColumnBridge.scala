package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` Column↔Expression conversion.
  *
  * Spark 4 unified `Column` over a ColumnNode IR (classic vs connect),
  * hiding the Expression-backed constructor that extension libraries
  * use to surface custom Catalyst expressions as `Column`s. This shim
  * lives in the `org.apache.spark.sql` namespace purely to re-export
  * that conversion — the standard pattern for Spark-native extension
  * libraries built on the classic execution engine.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
