package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the private[sql] Column⇄Expression converters — the
  * standard extension-library shim for building Column APIs over
  * custom Catalyst expressions in Spark 4 (post-Connect refactor).
  */
object GraftShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
