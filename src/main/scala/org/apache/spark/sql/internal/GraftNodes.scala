package org.apache.spark.sql.internal

import org.apache.spark.sql.Column

/** Bridge into the `private[internal]` ColumnNode tree — used by the TQL
  * `let` statement to reject bindings that reference event fields (anything
  * reaching an [[UnresolvedAttribute]] node) before Catalyst ever sees the
  * plan, and by the TQL list lambdas to build ColumnNode-level
  * [[LambdaFunction]]s exactly as `functions.transform`/`filter` do. Same
  * extension seam as `GraftExpr`/`GraftArrow`.
  */
object GraftNodes {

  /** A lambda-parameter Column: references inside the body resolve to the
    * enclosing HOF's lambda variable by name (`ResolveLambdaVariables`).
    */
  def lambdaVar(name: String): Column =
    new Column(UnresolvedNamedLambdaVariable(name))

  /** `params => body` as a Column — each param must be a [[lambdaVar]]
    * result, the same Columns the body was parsed against.
    */
  def lambdaFunction(body: Column, params: Seq[Column]): Column =
    new Column(LambdaFunction(body.node,
      params.map(_.node.asInstanceOf[UnresolvedNamedLambdaVariable])))

  /** Names of the event fields a Column's node tree references, with proper
    * lambda scoping: a lambda-bound parameter is NOT a field reference; an
    * unbound lambda variable IS (analysis falls it back to an attribute).
    * Empty for a constant-only expression.
    */
  def fieldRefs(n: ColumnNodeLike): Seq[String] = freeRefs(n, Set.empty)

  private def freeRefs(n: ColumnNodeLike, bound: Set[String]): Seq[String] = n match {
    case a: UnresolvedAttribute => Seq(a.nameParts.mkString("."))
    case _: UnresolvedStar => Seq("*") // star captures the whole event
    case l: LambdaFunction =>
      freeRefs(l.function, bound ++ l.arguments.map(_.name))
    case v: UnresolvedNamedLambdaVariable =>
      if (bound.contains(v.name)) Nil else Seq(v.name)
    // a Column built directly from a Catalyst expression (GraftExpr.column —
    // e.g. the TQL `this` star's UnresolvedRegex): same free-variable walk
    // on the expression tree
    case e: org.apache.spark.sql.classic.ExpressionColumnNode =>
      exprFreeRefs(e.expression, bound)
    case other => other.children.flatMap(freeRefs(_, bound))
  }

  private def exprFreeRefs(
      e: org.apache.spark.sql.catalyst.expressions.Expression,
      bound: Set[String]): Seq[String] = {
    import org.apache.spark.sql.catalyst.analysis.{Star, UnresolvedAttribute => CatalystAttr}
    import org.apache.spark.sql.catalyst.expressions.{
      LambdaFunction => CatalystLambda, UnresolvedNamedLambdaVariable => CatalystVar}
    e match {
      case l: CatalystLambda =>
        exprFreeRefs(l.function, bound ++ l.arguments.map(_.name))
      case v: CatalystVar =>
        if (bound.contains(v.nameParts.head)) Nil else Seq(v.nameParts.mkString("."))
      case a: CatalystAttr => Seq(a.name)
      case _: Star => Seq("*")
      case other => other.children.flatMap(exprFreeRefs(_, bound))
    }
  }
}
