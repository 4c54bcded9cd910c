package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Catalyst Expression bridge.
  *
  * Spark 4's Connect-compatible `Column` carries a `ColumnNode`, not an
  * `Expression`; the classic-session converter that maps between them
  * (`org.apache.spark.sql.classic.ExpressionUtils`) is `private[sql]`.
  * graft's SQL function registry needs exactly that conversion — a
  * registered function receives `Seq[Expression]` and wants to reuse
  * the operator library's Column compositions as the single source of
  * truth — so this object, compiled into the `org.apache.spark.sql`
  * namespace, re-exports the two methods. No other internals are
  * touched; behavior is exactly the classic session's own resolution.
  */
object GraftColumnBridge {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)

  /** EAGER node→expression conversion. `ExpressionUtils.expression`
    * returns a lazy `ColumnNodeExpression` that only resolves when the
    * analyzer's own converter pass sees it — an expression returned
    * from a FunctionRegistry builder bypasses that pass and would die
    * Unevaluable at codegen. Converting eagerly yields a plain
    * catalyst tree (built-ins as `UnresolvedFunction`s the analyzer
    * resolves in its normal fixed point).
    */
  def toExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
