package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Classic-mode bridge between [[Column]] and Catalyst [[Expression]].
  *
  * Spark 4 made `Column` wrap a connect-compatible `ColumnNode`; the
  * expression constructor moved behind `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`). This object
  * lives in the `org.apache.spark.sql` namespace solely to re-export
  * those two conversions for graft's native expressions — the same
  * technique Spark-native libraries use for classic-mode extensions.
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
