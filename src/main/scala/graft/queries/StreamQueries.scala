package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Pipe._
import graft.streaming.StreamOps

/** Driver-checked query catalog, part 8: the streaming operator surface under
  * batch-mode oracles, plus the remaining spec-only relational ops.
  *
  * The watermarked window helpers ([[StreamOps]]) are plan fragments that run
  * identically in batch mode (Catalyst's `EliminateEventTimeWatermark` drops
  * the watermark node when the child is not streaming), so the exact same
  * code path the streaming specs drive gets a hard DuckDB oracle here:
  * tumbling = epoch-aligned `floor(epoch/len)` buckets, sliding = each row in
  * exactly len/slide buckets, session = gaps-and-islands with `end = last
  * event + gap` (reference analogue: `summarize resolution=` time-bucket
  * rounding, `libtenzir/builtins/operators/summarize.cpp:255-257`; group
  * expiry :495-527 — the reference has no sliding/session forms at all).
  */
object StreamQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Epoch-aligned naive-timestamp bucket of `ts`, DuckDB side. */
  private def bucketSql(lenSec: Long, shift: Long = 0L): String =
    s"make_timestamp((CAST(floor(epoch(ts) / $lenSec) AS BIGINT) * $lenSec - $shift) * 1000000)"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // `move to=from` — rename keeping all other columns (move.cpp).
    "q_move" -> ((s, d) =>
      t(s, d, "events").move_("uid", "user_id")
        .select(col("event_id"), col("uid"), col("event_type"))),

    // `assert` — drop-on-failure with an observed dropped-count metric.
    "q_assert" -> ((s, d) =>
      t(s, d, "events").assert_(col("value") > lit(100.0))
        .select(col("event_id"), col("value"))),

    // `fork { a } { b }` — both branches over ONE shared scan, tagged union.
    "q_fork" -> ((s, d) => {
      val (a, b) = t(s, d, "events").fork_(
        _.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
          .select(lit("by_type").as("branch"), col("event_type").as("k"), col("n")),
        _.filter(col("value") > lit(500.0))
          .groupBy(pmod(col("user_id"), lit(10L)).cast("string").as("k"))
          .agg(count(lit(1)).as("n"))
          .select(lit("hot_by_user").as("branch"), col("k"), col("n")))
      a.unionByName(b)
    }),

    // Reference-exact `sample`: k = ln(prev period count), min_events
    // snap-back, max_rate cap, max_samples per-period bound (sample.cpp).
    "q_sample_rate" -> ((s, d) =>
      t(s, d, "events")
        .sampleRate_(col("ts"), periodSec = 86400, keyCol = col("event_id"),
          mode = "ln", minEvents = 30L, maxRate = Some(6L), maxSamples = Some(40L))
        .select(col("event_id"), col("user_id"))),

    // Tumbling 6h event-time windows (watermark node eliminated in batch).
    "q_window_tumbling" -> ((s, d) =>
      StreamOps.windowedSummarize(
          t(s, d, "events"), "ts", "6 hours", "1 hour",
          Seq(col("event_type")),
          Seq(count(lit(1)).as("n"),
            sum(floor(col("value")).cast("long")).as("total")))
        .select(
          col("window.start").cast("timestamp_ntz").as("w_start"),
          col("window.end").cast("timestamp_ntz").as("w_end"),
          col("event_type"), col("n"), col("total"))),

    // Sliding 24h windows every 6h — each row lands in exactly 4 windows.
    "q_window_sliding" -> ((s, d) =>
      StreamOps.slidingSummarize(
          t(s, d, "events"), "ts", "24 hours", "6 hours", "1 hour",
          Seq.empty,
          Seq(count(lit(1)).as("n"),
            sum(floor(col("value")).cast("long")).as("total")))
        .select(
          col("window.start").cast("timestamp_ntz").as("w_start"),
          col("window.end").cast("timestamp_ntz").as("w_end"),
          col("n"), col("total"))),

    // Session windows per user, 30-minute gap; end = last event + gap.
    "q_window_session" -> ((s, d) =>
      StreamOps.sessionSummarize(
          t(s, d, "events"), "ts", "30 minutes", "1 hour",
          Seq(col("user_id")),
          Seq(count(lit(1)).as("n")))
        .select(
          col("user_id"),
          col("session_window.start").cast("timestamp_ntz").as("w_start"),
          col("session_window.end").cast("timestamp_ntz").as("w_end"),
          col("n"))))

  val oracleSql: Map[String, String] = Map(
    "q_move" ->
      "SELECT event_id, user_id AS uid, event_type FROM events",

    "q_assert" ->
      "SELECT event_id, value FROM events WHERE value > 100.0",

    "q_fork" ->
      """SELECT 'by_type' AS branch, event_type AS k, count(*) AS n
        |FROM events GROUP BY event_type
        |UNION ALL
        |SELECT 'hot_by_user' AS branch, CAST(user_id % 10 AS VARCHAR) AS k,
        |  count(*) AS n
        |FROM events WHERE value > 500.0 GROUP BY 2""".stripMargin,

    "q_sample_rate" ->
      """WITH b AS (SELECT event_id, user_id,
        |    CAST(floor(epoch(ts) / 86400) AS BIGINT) AS bb,
        |    ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT AS h
        |  FROM events),
        |c AS (SELECT bb, count(*) AS n FROM b GROUP BY bb),
        |r AS (SELECT bb,
        |    CASE WHEN coalesce(CASE WHEN lag(bb) OVER (ORDER BY bb) = bb - 1
        |                            THEN lag(n) OVER (ORDER BY bb) END, 0) < 30 THEN 1
        |         ELSE least(greatest(1,
        |           CAST(floor(ln(lag(n) OVER (ORDER BY bb))) AS BIGINT)), 6)
        |    END AS k
        |  FROM c)
        |SELECT event_id, user_id FROM b JOIN r USING (bb) WHERE h % k = 0
        |QUALIFY row_number() OVER (PARTITION BY bb ORDER BY h, event_id) <= 40""".stripMargin,

    "q_window_tumbling" ->
      s"""SELECT ${bucketSql(21600)} AS w_start,
         |  ${bucketSql(21600, -21600)} AS w_end,
         |  event_type, count(*) AS n,
         |  CAST(sum(CAST(floor(value) AS BIGINT)) AS BIGINT) AS total
         |FROM events GROUP BY 1, 2, 3""".stripMargin,

    // start = 6h-bucket - k*6h for k in 0..3 (24h length / 6h slide):
    // ts - bucket < 6h <= 24h - k*6h, so all 4 windows always contain ts.
    "q_window_sliding" ->
      s"""WITH x AS (
         |  SELECT ts, value, u.k AS k
         |  FROM events CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k) u
         |)
         |SELECT make_timestamp((CAST(floor(epoch(ts) / 21600) AS BIGINT) * 21600
         |    - k * 21600) * 1000000) AS w_start,
         |  make_timestamp((CAST(floor(epoch(ts) / 21600) AS BIGINT) * 21600
         |    - k * 21600 + 86400) * 1000000) AS w_end,
         |  count(*) AS n, CAST(sum(CAST(floor(value) AS BIGINT)) AS BIGINT) AS total
         |FROM x GROUP BY 1, 2""".stripMargin,

    // TOTAL order (ts, event_id) in BOTH windows: with duplicate (user_id,
    // ts) rows (the sf1 tier's shape) an ORDER BY ts alone lets the two
    // windows order ties independently — the session-start marker row can
    // then sit at a different tie position in the cumulative sum than in the
    // lag, yielding overlapping "sessions" (caught at sf1: 3 net rows, ~40
    // sessions split wrong; the engine's session_window was correct)
    "q_window_session" ->
      """WITH s AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |              <= INTERVAL 30 MINUTE
        |         THEN 0 ELSE 1 END AS new_s
        |  FROM events
        |), g AS (
        |  SELECT user_id, ts,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                     ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM s
        |)
        |SELECT user_id, min(ts) AS w_start,
        |  max(ts) + INTERVAL 30 MINUTE AS w_end, count(*) AS n
        |FROM g GROUP BY user_id, sid""".stripMargin)
}
