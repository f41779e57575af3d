package org.apache.spark.sql.internal

/** Bridge into the `private[internal]` ColumnNode tree walk — used by the
  * TQL `let` statement to reject bindings that reference event fields
  * (anything reaching an [[UnresolvedAttribute]] node) before Catalyst ever
  * sees the plan. Same extension seam as `GraftExpr`/`GraftArrow`.
  */
object GraftNodes {
  def fieldRefs(n: ColumnNodeLike): Seq[String] = n match {
    case a: UnresolvedAttribute => Seq(a.nameParts.mkString("."))
    case _: UnresolvedStar => Seq("*") // `this` / star capture the whole event
    case other => other.children.flatMap(fieldRefs)
  }
}
