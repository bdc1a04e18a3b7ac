package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between the public Column API and catalyst Expressions for
  * the classic (non-Connect) runtime. Spark 4 removed the public
  * `new Column(expr)` constructor; the supported interchange lives in
  * `org.apache.spark.sql.classic.ExpressionUtils`, which is
  * `private[sql]` — this shim re-exports it from inside the package so
  * graft's native expressions (e.g. DotProduct) can surface as Columns. */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
