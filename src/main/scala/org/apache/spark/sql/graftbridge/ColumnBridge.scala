package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public `new Column(Expression)` constructor in
  * favor of ColumnNode; the supported bridge lives in the sql-private
  * `classic.ExpressionUtils`. This shim re-exports it for graft's
  * custom Catalyst expressions — the same pattern other Spark
  * extension libraries use to attach native expressions to the public
  * Column API.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
