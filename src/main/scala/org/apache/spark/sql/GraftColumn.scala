package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `sql` package: lifts a Catalyst `Expression` into a
  * public `Column` and back. The constructors are `private[sql]` in Spark
  * 4; extension libraries conventionally bridge this way so custom
  * expressions work on *any* session, with no registration required.
  */
object GraftColumn {
  def apply(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expr(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
