package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge. Spark 4's Column wraps a ColumnNode
  * and the conversion helpers are private[sql]; this shim (in an
  * org.apache.spark.sql subpackage, the standard extension-point
  * technique) exposes exactly the two conversions our custom
  * expressions need. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
