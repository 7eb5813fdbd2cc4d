package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column ↔ Expression converters — the
  * minimal hook a library needs to expose custom Catalyst Expressions
  * through the public Column API (Spark 4 removed the public
  * `new Column(expr)` constructor). */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
