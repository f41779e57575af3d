package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming operator surface over Structured Streaming.
  *
  * The reference has *no* watermark/event-time windows — its only late-data
  * tools are processing-time group timeouts
  * (`/root/reference/libtenzir/builtins/operators/summarize.cpp:495-527`) and
  * TTL'd context state (`contexts/lookup_table.cpp:218-243`). Spark's
  * watermarked event-time machinery is a strict superset; these helpers map
  * the reference's streaming semantics onto it:
  *
  *  - `summarize … resolution=1h, timeout=t`  → [[windowedSummarize]]
  *    (tumbling window + watermark replaces the processing-time flush)
  *  - `deduplicate … timeout=t`               → [[dedupWithinWatermark]]
  *  - `measure` / `assert_throughput`         → `observe` + progress metrics
  *
  * All helpers are plan fragments: they compose with `readStream` sources and
  * any sink, and run identically on a 1000-executor cluster (state is
  * hash-partitioned by group key across executors).
  */
object StreamOps {

  /** Tumbling-window aggregation with watermark-bounded state: the streaming
    * analogue of `summarize group…, agg… resolution=w` with late events
    * dropped after `lateness` (reference: time-bucket rounding,
    * `summarize.cpp:255-257`; group expiry :495-527).
    */
  def windowedSummarize(
      stream: DataFrame,
      tsCol: String,
      windowLen: String,
      lateness: String,
      groupBy: Seq[Column],
      aggs: Seq[Column]): DataFrame =
    stream.withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), windowLen) +: groupBy: _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Sliding-window variant (window length + slide interval). */
  def slidingSummarize(
      stream: DataFrame,
      tsCol: String,
      windowLen: String,
      slide: String,
      lateness: String,
      groupBy: Seq[Column],
      aggs: Seq[Column]): DataFrame =
    stream.withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), windowLen, slide) +: groupBy: _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Session windows (gap-based) — beyond the reference's capability set but
    * a first-class Spark primitive; state closes `gap` after the last event.
    */
  def sessionSummarize(
      stream: DataFrame,
      tsCol: String,
      gap: String,
      lateness: String,
      groupBy: Seq[Column],
      aggs: Seq[Column]): DataFrame =
    stream.withWatermark(tsCol, lateness)
      .groupBy(session_window(col(tsCol), gap) +: groupBy: _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Streaming dedup with bounded state: keeps the first event per key,
    * forgetting keys once the watermark passes (reference analogue:
    * `deduplicate --timeout`, `deduplicate.cpp:107-205`).
    */
  def dedupWithinWatermark(
      stream: DataFrame,
      tsCol: String,
      lateness: String,
      keys: Seq[String]): DataFrame =
    stream.withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark(keys)
}
