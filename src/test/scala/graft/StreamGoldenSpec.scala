package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamOps

/** Streaming-mode goldens: drive LATE and DUPLICATE rows through real
  * `MemoryStream` queries with watermarks, batch boundaries controlled, and
  * assert the final output equals a batch twin computed over the events the
  * documented watermark semantics keep. The twin simulates Spark's rule
  * directly — the watermark after batch i is `max event time ≤ i` minus the
  * delay; a row in batch i+1 is late iff its window (aggregations) or its own
  * timestamp (dedup) is behind the watermark — so stream and batch must
  * agree exactly (reference analogue: group expiry `summarize.cpp:495-527`,
  * `deduplicate --timeout` `deduplicate.cpp:107-205`).
  */
class StreamGoldenSpec extends SparkSpec {
  import spark.implicits._

  private val base = 1704067200L
  private def ts(s: Long) = new Timestamp((base + s) * 1000L)

  /** (ts-seconds, key, value) batches → survivors per the watermark rule.
    * `keepIf(wmSec, row)` decides lateness per op kind; wm starts at -inf.
    */
  private def survivors(batches: Seq[Seq[(Long, String, Double)]], latenessSec: Long)(
      keepIf: (Long, (Long, String, Double)) => Boolean): Seq[(Long, String, Double)] = {
    var wm = Long.MinValue
    val out = Seq.newBuilder[(Long, String, Double)]
    batches.foreach { b =>
      out ++= b.filter(r => wm == Long.MinValue || keepIf(wm, r))
      wm = math.max(wm, b.map(_._1).max - latenessSec)
    }
    out.result()
  }

  private def runStream(batches: Seq[Seq[(Long, String, Double)]],
      plan: DataFrame => DataFrame, name: String): DataFrame = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val q = plan(input.toDF().toDF("ts", "k", "v"))
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      batches.foreach { b =>
        input.addData(b.map { case (s, k, v) => (ts(s), k, v) })
        q.processAllAvailable()
      }
      // close every window so append mode emits the tail
      input.addData(Seq((ts(100000), "zz", 0.0)))
      q.processAllAvailable()
    } finally q.stop()
    spark.table(name)
  }

  // on-time head; late-but-within-delay row (window open: KEPT); late row far
  // behind the watermark (window closed: DROPPED); then watermark advances
  private val aggBatches = Seq(
    Seq((10L, "a", 1.0), (20L, "a", 2.0), (70L, "b", 5.0), (200L, "c", 1.0)),
    // wm = 200-120 = 80: window [0,60) closed → (15,a) dropped;
    // [60,120) and [180,240) open → (65,b) and (185,c) kept
    Seq((15L, "a", 100.0), (65L, "b", 7.0), (185L, "c", 3.0), (500L, "a", 9.0)),
    // wm = 500-120 = 380: everything before 380 closed → (70,b) dropped
    Seq((70L, "b", 1000.0), (520L, "d", 4.0)))

  test("tumbling golden: stream with late drops equals the batch twin") {
    val got = runStream(aggBatches,
      df => StreamOps.windowedSummarize(df, "ts", "1 minute", "2 minutes",
        groupBy = Seq(col("k")),
        aggs = Seq(count(lit(1)).as("n"), sum(col("v")).as("total"))), "g_tumb")
    val kept = survivors(aggBatches, 120L) { case (wm, (t, _, _)) =>
      (t / 60 * 60 + 60) > wm }
    val twin = kept.map { case (s, k, v) => (ts(s), k, v) }.toDF("ts", "k", "v")
      .groupBy(window(col("ts"), "1 minute"), col("k"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("total"))
    val norm = (df: DataFrame) => df.filter(col("k") =!= "zz")
      .select(col("window.start").cast("long"),
      col("k"), col("n"), col("total")).as[(Long, String, Long, Double)].collect().toSet
    assert(norm(got) == norm(twin))
    // the golden is non-trivial: at least one late row was actually dropped
    assert(kept.size < aggBatches.map(_.size).sum + 1)
  }

  test("sliding golden: every covering window agrees with the batch twin") {
    val got = runStream(aggBatches,
      df => StreamOps.slidingSummarize(df, "ts", "2 minutes", "1 minute", "2 minutes",
        groupBy = Seq(col("k")),
        aggs = Seq(count(lit(1)).as("n"), sum(col("v")).as("total"))), "g_slide")
    // sliding lateness is PER WINDOW, not per row: a late row still feeds
    // each covering window whose end is ahead of the watermark, and only the
    // already-closed ones drop it — so the twin enumerates (window, row)
    // pairs and applies the rule to each
    var wm = Long.MinValue
    val pairs = Seq.newBuilder[(Long, String, Double)] // (winStartSec, k, v)
    var droppedPairs = 0
    aggBatches.foreach { b =>
      b.foreach { case (t, k, v) =>
        (0 to 1).foreach { j => // len 120 / slide 60 → 2 covering windows
          val start = t / 60 * 60 - j * 60
          if (wm == Long.MinValue || start + 120 > wm) pairs += ((start, k, v))
          else droppedPairs += 1
        }
      }
      wm = math.max(wm, b.map(_._1).max - 120L)
    }
    val twin = pairs.result().toDF("ws", "k", "v")
      .groupBy(col("ws"), col("k"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("total"))
      .select(col("ws") + base, col("k"), col("n"), col("total"))
      .as[(Long, String, Long, Double)].collect().toSet
    val gotSet = got.filter(col("k") =!= "zz")
      .select(col("window.start").cast("long"),
        col("k"), col("n"), col("total")).as[(Long, String, Long, Double)].collect().toSet
    assert(gotSet == twin)
    assert(droppedPairs > 0) // the golden actually exercised late drops
  }

  test("session golden: gap sessions with a late row dropped after close") {
    val batches = Seq(
      Seq((10L, "a", 1.0), (30L, "a", 2.0), (300L, "b", 5.0)),
      // wm = 300-60 = 240: a's [10,90) session is closed → (40,a) dropped;
      // b's session [300,360) still open → (320,b) merges into it
      Seq((40L, "a", 100.0), (320L, "b", 7.0), (700L, "c", 1.0)))
    val got = runStream(batches,
      df => StreamOps.sessionSummarize(df, "ts", "1 minute", "1 minute",
        groupBy = Seq(col("k")),
        aggs = Seq(count(lit(1)).as("n"), sum(col("v")).as("total"))), "g_sess")
    val kept = survivors(batches, 60L) { case (wm, (t, _, _)) => t >= wm }
    val twin = kept.map { case (s, k, v) => (ts(s), k, v) }.toDF("ts", "k", "v")
      .groupBy(session_window(col("ts"), "1 minute"), col("k"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("total"))
    val norm = (df: DataFrame) => df.filter(col("k") =!= "zz")
      .select(col("session_window.start").cast("long"),
      col("k"), col("n"), col("total")).as[(Long, String, Long, Double)].collect().toSet
    assert(norm(got) == norm(twin))
    assert(kept.size < batches.map(_.size).sum + 1)
  }

  test("dedup golden: duplicates within the delay dropped, re-emitted after expiry") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Long)]
    val q = StreamOps.dedupWithinWatermark(
      input.toDF().toDF("ts", "k", "seq"), "ts", "2 minutes", Seq("k"))
      .writeStream.format("memory").queryName("g_dd").outputMode("append").start()
    try {
      // batch 0: first x + in-batch duplicate; first y
      input.addData(Seq((ts(10), "x", 1L), (ts(20), "x", 2L), (ts(30), "y", 3L)))
      q.processAllAvailable()
      // batch 1: duplicate x within the delay (dropped), advance time
      input.addData(Seq((ts(60), "x", 4L), (ts(100), "z", 5L)))
      q.processAllAvailable()
      // batch 2: wm = 100-120 < expiry of x's state (10+120=130): still dup;
      // push wm past every key's expiry
      input.addData(Seq((ts(90), "x", 6L), (ts(1000), "w", 7L)))
      q.processAllAvailable()
      // batch 3: wm = 1000-120 = 880 — x/y/z state expired → x re-emits
      // (the reference's `deduplicate --timeout` re-emission contract)
      input.addData(Seq((ts(2000), "x", 8L)))
      q.processAllAvailable()
      val rows = spark.table("g_dd").select("k", "seq")
        .as[(String, Long)].collect().toSet
      assert(rows == Set(("x", 1L), ("y", 3L), ("z", 5L), ("w", 7L), ("x", 8L)))
    } finally q.stop()
  }
}
