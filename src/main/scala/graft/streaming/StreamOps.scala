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

  /** `delay field [speed=x]` — re-emit events on the cadence of their own
    * event-time column (reference
    * `/root/reference/libtenzir/builtins/operators/delay.cpp`: sleeps each
    * batch until `anchor + (ts - start) / speed`). Spark mapping: a
    * foreachBatch pacer — before handing a micro-batch to `sink`, sleep until
    * the wall-clock anchor plus the batch's max event-time offset (divided by
    * `speed`) has passed. Pacing is driver-side and batch-granular: the
    * micro-batch is the unit of emission in Structured Streaming, and a
    * two-row aggregate per batch costs nothing while the batch itself never
    * funnels through the driver.
    */
  def delayedSink(
      tsCol: String,
      speed: Double,
      sink: (DataFrame, Long) => Unit): (DataFrame, Long) => Unit = {
    var anchorWallMs = -1L
    var anchorEventMs = -1L
    (batch: DataFrame, id: Long) => {
      val mm = batch
        .agg((min(col(tsCol)).cast("double") * 1000).cast("long"),
          (max(col(tsCol)).cast("double") * 1000).cast("long"))
        .head()
      if (!mm.isNullAt(0)) {
        if (anchorWallMs < 0) {
          anchorWallMs = System.currentTimeMillis()
          anchorEventMs = mm.getLong(0)
        }
        val targetWall = anchorWallMs + ((mm.getLong(1) - anchorEventMs) / speed).toLong
        val sleepMs = targetWall - System.currentTimeMillis()
        if (sleepMs > 0) Thread.sleep(sleepMs)
      }
      sink(batch, id)
    }
  }

  /** `throttle max_bw [window]` (reference
    * `/root/reference/libtenzir/builtins/operators/throttle.cpp`: caps the
    * stream's data rate, stalling upstream when the budget for the current
    * window is spent). Spark mapping: a foreachBatch pacer — before handing
    * micro-batch i+1 to `sink`, sleep until the CUMULATIVE units shipped
    * stay ≤ `maxPerSec × elapsed`. Pacing is driver-side and batch-granular
    * (the micro-batch is Structured Streaming's emission unit); in-batch
    * rate is bounded by also sizing triggers (`maxFilesPerTrigger`).
    * `unitsOf` defaults to row count (events/sec); pass a byte measure
    * (e.g. `sum(octet_length(to_json(struct(*))))`) for the reference's
    * bytes/sec semantics — one tiny agg job per batch, negligible on a
    * deliberately rate-capped stream.
    */
  def throttledSink(
      maxPerSec: Double,
      sink: (DataFrame, Long) => Unit,
      unitsOf: DataFrame => Long = _.count()): (DataFrame, Long) => Unit = {
    require(maxPerSec > 0, "throttle rate must be positive")
    var startWallMs = -1L
    var shipped = 0L
    (batch: DataFrame, id: Long) => {
      if (startWallMs < 0) startWallMs = System.currentTimeMillis()
      else {
        // budget check BEFORE shipping this batch: everything shipped so far
        // must fit the rate; sleep off any overdraft
        val targetWall = startWallMs + (shipped / maxPerSec * 1000).toLong
        val sleepMs = targetWall - System.currentTimeMillis()
        if (sleepMs > 0) Thread.sleep(sleepMs)
      }
      shipped += unitsOf(batch)
      sink(batch, id)
    }
  }

  /** `buffer n policy=drop` (reference
    * `/root/reference/libtenzir/builtins/operators/buffer.cpp`: a bounded
    * element buffer between producer and consumer; `drop` discards what the
    * consumer can't keep up with, `block` stalls the producer). Spark
    * mapping: `block` IS Structured Streaming's native backpressure
    * (trigger sizing — the source never outruns the sink); `drop` becomes a
    * per-micro-batch bound: keep a deterministic `maxRows` subset (hash
    * order on `keyCols`, so replays drop the SAME rows) and report the
    * overflow to `onDrop` — the observable-drop contract (no silent caps).
    */
  def boundedSink(
      maxRows: Int,
      keyCols: Seq[String],
      sink: (DataFrame, Long) => Unit,
      onDrop: (Long, Long) => Unit = (_, _) => ()): (DataFrame, Long) => Unit =
    (batch: DataFrame, id: Long) => {
      val h = graft.functions.Text.md5h60(
        concat_ws(" ", keyCols.map(col): _*))
      // full-row hash tiebreak: rows sharing key values must still order
      // deterministically, or a replay straddling the cutoff would ship a
      // different subset
      val tiebreak = graft.functions.Text.md5h60(to_json(struct(batch.columns.map(col): _*)))
      // sorted limit = TakeOrderedAndProject: per-partition top-n, then one
      // n-row merge on the driver side of the exchange — fully parallel,
      // never a single-partition window
      // persist for the micro-batch: the count, the TakeOrdered cutoff, and
      // the sink all read one materialization instead of re-scanning the
      // (possibly expensive) upstream per action
      batch.persist()
      try {
        val total = batch.count()
        val kept = batch.orderBy(h, tiebreak).limit(maxRows)
        if (total > maxRows) {
          graft.ops.Diagnostics.warning("buffer_drop",
            s"batch $id: dropped ${total - maxRows} of $total rows (policy=drop, max=$maxRows)")
          onDrop(id, total - maxRows)
        }
        sink(kept, id)
      } finally batch.unpersist(blocking = false)
    }
}
