package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public `new Column(expr)` / `col.expr` surface
  * (Connect unification); the classic conversions live behind
  * `private[sql]`. This bridge re-exports the two we need for registering
  * custom Catalyst expressions — the standard extension-library trick of
  * compiling into the `org.apache.spark.sql` package namespace.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
