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

  /** Names of the event fields a Column's node tree references (empty for a
    * constant-only expression) — resolved BEFORE analysis, on the raw
    * ColumnNode tree (the catalyst conversion wraps it opaquely).
    */
  def fieldRefs(c: Column): Seq[String] = internal.GraftNodes.fieldRefs(c.node)
}
