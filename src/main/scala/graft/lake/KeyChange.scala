package graft.lake

import org.apache.spark.sql.{Column, GraftExpr}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Nondeterministic, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `true` exactly when `child` differs from its value on the PREVIOUS row of
  * the same partition (and always on the first row) — the streaming
  * "first row per key group" selector over partition-sorted input.
  *
  * `filter(KeyChange.column(col("url")))` after
  * `sortWithinPartitions(..., url, _lsn.desc, ...)` keeps the per-url LWW
  * winner with O(1) state per task: no hash map of wide rows (the
  * [[LakeTable.resolve]] `max_by` aggregate), no WindowExec buffering of a
  * whole bucket, and the plan stays inside WholeStageCodegen. This is the
  * sorted-run merge step of the L0→bucket compaction fold (the reference's
  * `rebuild.cpp` rewrite analogue, re-expressed as sort + streaming scan).
  *
  * Declared [[Nondeterministic]] because it IS row-order-dependent — which
  * doubles as the correctness fence: Catalyst never pushes, reorders, or
  * collapses nondeterministic predicates, so the filter cannot migrate below
  * the sort that feeds it. Callers own the contract that all rows of a key
  * are consecutive within the partition (same-key rows never straddle
  * partitions and the input is sorted by the key).
  */
case class KeyChange(child: Expression) extends UnaryExpression with Nondeterministic {

  override def nullable: Boolean = false
  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"KeyChange needs a STRING key, got ${child.dataType.catalogString}")

  @transient private var seen = false
  @transient private var prevNull = false
  @transient private var prev: UTF8String = _

  override protected def initializeInternal(partitionIndex: Int): Unit = {
    seen = false; prevNull = false; prev = null
  }

  override protected def evalInternal(input: InternalRow): Any = {
    val v = child.eval(input).asInstanceOf[UTF8String]
    val isNull = v == null
    val changed = !seen || isNull != prevNull || (!isNull && !v.equals(prev))
    if (changed) {
      // clone: the child's UTF8String points into a buffer the scan/sort
      // reuses on the next row
      prev = if (isNull) null else v.clone()
      prevNull = isNull
      seen = true
    }
    changed
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val seenRef = ctx.addMutableState(java.lang.Boolean.TYPE.getName, "kcSeen")
    val prevNullRef = ctx.addMutableState(java.lang.Boolean.TYPE.getName, "kcPrevNull")
    val prevRef = ctx.addMutableState(classOf[UTF8String].getName, "kcPrev")
    ctx.addPartitionInitializationStatement(
      s"$seenRef = false; $prevNullRef = false; $prevRef = null;")
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        boolean ${ev.value} = !$seenRef || ${c.isNull} != $prevNullRef ||
          (!${c.isNull} && !${c.value}.equals($prevRef));
        if (${ev.value}) {
          $prevRef = ${c.isNull} ? null : ${c.value}.clone();
          $prevNullRef = ${c.isNull};
          $seenRef = true;
        }
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): KeyChange =
    copy(child = newChild)
}

object KeyChange {
  /** Column form: `df.filter(KeyChange.column(col("url")))`. */
  def column(key: Column): Column = GraftExpr.column(KeyChange(GraftExpr.expression(key)))
}
