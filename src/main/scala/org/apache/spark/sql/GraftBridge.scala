package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into Spark's `private[sql]` Column ⇄ Expression
  * converters (Spark 4 moved these behind the classic module). Lives
  * in the sql package solely to re-export the two calls the graft
  * custom expressions need; no Spark internals are modified. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
