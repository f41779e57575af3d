package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column↔Expression converters — the
  * extension seam for building first-class Catalyst expressions (codegen'd,
  * null-propagating, optimizer-visible) from library code, as native
  * connectors do. Kept to exactly two forwarders.
  */
object GraftExpr {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
