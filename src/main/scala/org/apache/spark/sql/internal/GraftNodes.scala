package org.apache.spark.sql.internal

/** Bridge into the `private[internal]` ColumnNode tree walk — used by the
  * TQL `let` statement to reject bindings that reference event fields
  * (anything reaching an [[UnresolvedAttribute]] node) before Catalyst ever
  * sees the plan. Same extension seam as `GraftExpr`/`GraftArrow`.
  */
object GraftNodes {
  def fieldRefs(n: ColumnNodeLike): Seq[String] = n match {
    case a: UnresolvedAttribute => Seq(a.nameParts.mkString("."))
    case _: UnresolvedStar => Seq("*") // star captures the whole event
    // a Column built directly from a Catalyst expression (GraftExpr.column —
    // e.g. the TQL `this` star, an UnresolvedRegex): walk the expression
    // tree for attribute/star references
    case e: org.apache.spark.sql.classic.ExpressionColumnNode =>
      e.expression.collect {
        case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute => a.name
        case _: org.apache.spark.sql.catalyst.analysis.Star => "*"
      }
    case other => other.children.flatMap(fieldRefs)
  }
}
