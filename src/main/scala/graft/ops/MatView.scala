package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental materialized-view maintenance over the lake's CDC changelog —
  * the canonical downstream consumer of `LakeTable.changes(withPreimages =
  * true)` / `CdcStream.followChanges`: keep a keyed aggregate (counts +
  * integer sums) of the page table continuously up to date by folding each
  * changelog delta into the view, instead of re-aggregating the table.
  *
  * At 10^10 rows a per-poll re-aggregation is an O(table) scan + shuffle;
  * the incremental fold is O(delta) + a join against only the TOUCHED view
  * keys — the asymptotic win Delta/Iceberg CDF exists to enable. The same
  * role in the reference is a `summarize`-over-`subscribe` pipeline
  * (continuous aggregation over the internal event stream).
  *
  * Correctness model (classic IVM for distributive aggregates): every
  * preimage-changelog row carries a sign — `insert` / `update_postimage`
  * +1, `delete` / `update_preimage` −1 — so per-key `count` and `sum`
  * telescope EXACTLY across any batching of the same changes. The changelog
  * MUST be the preimage convention; a plain `update` row has no sign (it
  * mixes a retraction and an assertion) and is rejected at evaluation time.
  * Sum semantics: integer-typed, null-as-zero (`Σ coalesce(expr, 0)`) —
  * longs telescope exactly (floats would drift by fold order) and the
  * null-as-zero convention makes the result independent of fold history
  * (plain SQL `sum` returns NULL for an all-null group, which no retractable
  * fold can reproduce without per-sum non-null counts). `min`/`max` are NOT
  * maintainable this way under deletes (a retracted extremum needs a re-scan
  * of its group) and are deliberately absent.
  *
  * A bootstrap delivery (`followChanges` with an expired cursor: full state
  * as inserts, `from = -1`) is folded with `update(None, ...)` — the view
  * is rebuilt, same code path. NULL group keys are first-class: the join is
  * null-safe, so NULL-keyed rows accumulate in one view row exactly as a
  * direct `groupBy` would place them.
  */
object MatView {

  /** Aggregate a (preimage-convention) changelog into a signed per-key
    * delta: `(keys..., n, <sumCols...>)` where `n` is the live-row count
    * delta and each sum column telescopes its expression. One map-side-
    * combinable shuffle over the delta only. An unexpected `change_type`
    * (e.g. a plain-convention `update` row) raises at evaluation.
    */
  def delta(changes: DataFrame, keys: Seq[String],
      sums: Map[String, Column]): DataFrame = {
    val sign = when(col("change_type").isin("insert", "update_postimage"), 1L)
      .when(col("change_type").isin("delete", "update_preimage"), -1L)
      .otherwise(raise_error(concat(
        lit("MatView requires the preimage changelog convention; got change_type "),
        col("change_type"))).cast("long"))
    val aggs = sum(sign).as("n") +:
      sums.toSeq.sortBy(_._1).map { case (n, e) =>
        sum(coalesce(e.cast("long"), lit(0L)) * sign).as(n)
      }
    changes.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Fold a delta into the current view (both in `delta`'s schema):
    * null-safe full outer join on the keys, component-wise add, drop keys
    * whose live count reaches zero. Cost: one join keyed on the view — with
    * the view bucketed or range-partitioned on the keys this touches only
    * matching partitions.
    */
  def applyDelta(view: DataFrame, d: DataFrame, keys: Seq[String]): DataFrame = {
    val valCols = view.columns.filterNot(keys.contains)
    require(valCols.sameElements(d.columns.filterNot(keys.contains)),
      s"view/delta schema mismatch: ${view.columns.toSeq} vs ${d.columns.toSeq}")
    val v = view.alias("v")
    val dr = d.select(keys.map(col) ++ valCols.map(c => col(c).as(s"_d_$c")): _*)
      .alias("d")
    // null-safe equality: a NULL group key is one group (as in groupBy),
    // not an always-fresh row
    val cond = keys.map(k => col(s"v.$k") <=> col(s"d.$k")).reduce(_ && _)
    v.join(dr, cond, "full_outer")
      .select(keys.map(k => coalesce(col(s"v.$k"), col(s"d.$k")).as(k)) ++
        valCols.map(c =>
          (coalesce(col(s"v.$c"), lit(0L)) +
            coalesce(col(s"d._d_$c"), lit(0L))).as(c)): _*)
      .filter(col("n") > 0)
  }

  /** Maintain: fold one changelog delivery into `view` (`None` = empty view
    * / bootstrap rebuild). The result is lazy; a production follower
    * persists or writes it per poll so plans do not chain unboundedly.
    */
  def update(view: Option[DataFrame], changes: DataFrame, keys: Seq[String],
      sums: Map[String, Column]): DataFrame = {
    val d = delta(changes, keys, sums)
    view.fold(d.filter(col("n") > 0))(v => applyDelta(v, d, keys))
  }
}
