package graft

import org.apache.spark.sql.functions._

import graft.ops.Pipe._

/** Positional/stateful operator semantics: parallel enumerate, full slice,
  * distance dedup, adaptive sample.
  */
class PipePositionalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val nums = spark.range(1000).select(
    col("id"), (col("id") * 7 % 13).as("k"))

  test("enumerate: parallel range-partitioned index equals the total order") {
    val out = nums.enumerate_(Seq(col("id").desc), "idx")
      .select("id", "idx").as[(Long, Long)].collect().toMap
    (0L until 1000L).foreach(id => assert(out(id) == 999 - id))
    // plan must NOT contain a single-partition exchange (the round-1 trap)
    val plan = nums.enumerate_(Seq(col("id")), "idx").queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), "enumerate still funnels to one partition")
  }

  test("slice: negative indices count from the end; stride filters") {
    val out = nums.slice_(10, -980, Seq(col("id")), "idx") // rows 10..19
      .select("id").as[Long].collect().sorted.toSeq
    assert(out == (10L until 20L))
    val strided = nums.slice_(0, 100, Seq(col("id")), "idx", stride = 25)
      .select("id").as[Long].collect().sorted.toSeq
    assert(strided == Seq(0L, 25L, 50L, 75L))
  }

  test("deduplicate distance: key is remembered for exactly n events") {
    // events: key A at positions 0, 5, 20; key B elsewhere; distance 10
    val rows = (0 until 30).map(i =>
      (i.toLong, if (i == 0 || i == 5 || i == 20) "A" else "B"))
    val df = rows.toDF("pos", "key")
    val kept = df.deduplicateDistance_(Seq("key"), Seq(col("pos")), distance = 10)
      .select("pos").as[Long].collect().toSet
    // A@0 emitted; A@5 suppressed (gap 5 <= 10); A@20 emitted (gap 15 > 10,
    // from the LAST occurrence at 5 — occurrences refresh even when suppressed)
    assert(kept.contains(0L) && !kept.contains(5L) && kept.contains(20L))
    // B: first occurrence at 1 emitted, consecutive others suppressed
    assert(kept.contains(1L))
    assert(!kept.contains(2L))
  }

  test("fork runs two branches over one cached input; attributes round-trip") {
    val (evens, sum) = nums.fork_(
      _.filter(col("id") % 2 === 0),
      _.agg(org.apache.spark.sql.functions.sum(col("id"))))
    assert(evens.count() == 500L)
    assert(sum.head().getLong(0) == (0L until 1000L).sum)
    val tagged = nums.setAttribute_("k", "unit", "bucket13")
    assert(tagged.getAttribute_("k", "unit").contains("bucket13"))
    assert(tagged.getAttribute_("k", "missing").isEmpty)
    assert(nums.getAttribute_("k", "unit").isEmpty)
  }

  test("timeshift shifts event time by an interval") {
    val df = Seq(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")).toDF("t")
    val out = df.timeshift_("t", expr("INTERVAL 90 MINUTES")).head().getTimestamp(0)
    assert(out == java.sql.Timestamp.valueOf("2024-01-01 01:30:00"))
  }

  test("adaptive sample: first period passes, later periods target the rate") {
    // 3 daily periods with 400 events each, target 100/period
    val df = (0 until 1200).map { i =>
      (i.toLong, java.sql.Timestamp.valueOf(s"2024-01-0${1 + i / 400} 00:00:${i % 60}"))
    }.toDF("id", "ts")
    val out = df.sampleAdaptive_(col("ts"), periodSec = 86400, targetPerPeriod = 100,
      keyCol = col("id"))
      .withColumn("day", dayofmonth(col("ts")))
      .groupBy("day").count().as[(Int, Long)].collect().toMap
    assert(out(1) == 400L) // first period: no history → everything passes
    // subsequent periods sample ~1-in-4 (hash-dependent, not exact)
    assert(out(2) < 250 && out(2) > 25, s"day2=${out(2)}")
    assert(out(3) < 250 && out(3) > 25, s"day3=${out(3)}")
    // deterministic across runs
    val again = df.sampleAdaptive_(col("ts"), 86400, 100, col("id")).count()
    assert(again == out.values.sum)
  }

  test("rate sample: mode fn, min_events snap-back, max_rate cap, max_samples bound") {
    // day1: 400 events; day2: 20 (< min_events); day3: 400
    val df = ((0 until 400).map(i => (i.toLong, 1)) ++
        (0 until 20).map(i => (400L + i, 2)) ++
        (0 until 400).map(i => (420L + i, 3)))
      .map { case (id, day) =>
        (id, java.sql.Timestamp.valueOf(s"2024-01-0$day 00:00:${id % 60}"))
      }.toDF("id", "ts")
    val byDay = df.sampleRate_(col("ts"), periodSec = 86400, keyCol = col("id"),
        mode = "ln", minEvents = 30L)
      .withColumn("day", dayofmonth(col("ts")))
      .groupBy("day").count().as[(Int, Long)].collect().toMap
    assert(byDay(1) == 400L) // first period: no history → 1:1
    // day2 rate = floor(ln(400)) = 5 → ~1-in-5 of 20 events
    assert(byDay(2) > 0 && byDay(2) < 15, s"day2=${byDay(2)}")
    assert(byDay(3) == 400L) // prev count 20 < min_events → 1:1 again
    // max_rate caps k; max_samples truncates each period deterministically
    val capped = df.sampleRate_(col("ts"), 86400, col("id"),
      mode = "sqrt", minEvents = 10L, maxRate = Some(2L), maxSamples = Some(7L))
    val cd = capped.withColumn("day", dayofmonth(col("ts")))
      .groupBy("day").count().as[(Int, Long)].collect().toMap
    assert(cd.values.forall(_ <= 7L))
    assert(capped.count() == capped.distinct().count())
    // deterministic across runs
    assert(capped.count() ==
      df.sampleRate_(col("ts"), 86400, col("id"), "sqrt", 10L, Some(2L), Some(7L)).count())
  }

  test("shuffle_ is a deterministic seeded permutation") {
    val df = spark.range(500).select(col("id"))
    val a = df.shuffle_(Seq(col("id")), seed = 7L)
      .select("id", "shuffle_pos").as[(Long, Long)].collect().toMap
    // a bijection onto 0..n-1
    assert(a.values.toSeq.sorted == (0L until 500L))
    // replay-identical
    val b = df.shuffle_(Seq(col("id")), seed = 7L)
      .select("id", "shuffle_pos").as[(Long, Long)].collect().toMap
    assert(a == b)
    // a different seed produces a different permutation (overwhelmingly)
    val c = df.shuffle_(Seq(col("id")), seed = 8L)
      .select("id", "shuffle_pos").as[(Long, Long)].collect().toMap
    assert(a != c)
    // and not the identity order
    assert((0L until 500L).exists(i => a(i) != i))
  }

  test("splitHash_ labels are stable, exhaustive, and subset-independent") {
    val df = spark.range(2000).select(col("id"))
    val fr = Seq("train" -> 0.5, "valid" -> 0.25, "test" -> 0.25)
    val full = df.splitHash_(fr, Seq(col("id")))
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(full.values.toSet == Set("train", "valid", "test"))
    val n = full.size.toDouble
    val counts = full.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(math.abs(counts("train") / n - 0.5) < 0.05)
    assert(math.abs(counts("valid") / n - 0.25) < 0.05)
    // membership is a pure function of the id: a half-corpus run agrees
    val half = spark.range(1000).select(col("id")).splitHash_(fr, Seq(col("id")))
      .select("id", "split").as[(Long, String)].collect().toMap
    half.foreach { case (id, sp) => assert(full(id) == sp) }
  }

  test("frontierSchedule_: per-host 0-based slots in order, spaced by the delay") {
    val urls = Seq(
      ("a.com", 3L), ("a.com", 1L), ("a.com", 2L),
      ("b.com", 9L)).toDF("host", "pri")
    val out = urls.frontierSchedule_(col("host"), Seq(col("pri")), delayMs = 500L)
      .select("host", "pri", "slot", "not_before_ms")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(out == Set(
      ("a.com", 1L, 0L, 0L), ("a.com", 2L, 1L, 500L), ("a.com", 3L, 2L, 1000L),
      ("b.com", 9L, 0L, 0L)))
  }

  test("frontierSchedule_: deterministic under order-key ties; clobber is an error") {
    // three rows tie on pri — the full-row hash tiebreak must give the same
    // slot assignment on every run / partitioning
    val urls = Seq(
      ("a.com", 1L, "u1"), ("a.com", 1L, "u2"), ("a.com", 1L, "u3"))
      .toDF("host", "pri", "url")
    def run() = urls.repartition(3)
      .frontierSchedule_(col("host"), Seq(col("pri")), delayMs = 100L)
      .select("url", "slot").as[(String, Long)].collect().toMap
    val first = run()
    assert((1 to 3).forall(_ => run() == first))
    assert(first.values.toSet == Set(0L, 1L, 2L))
    // existing output column name → error, not a silent overwrite
    val ex = intercept[IllegalArgumentException] {
      urls.withColumn("slot", lit(99L))
        .frontierSchedule_(col("host"), Seq(col("pri")), delayMs = 100L)
    }
    assert(ex.getMessage.contains("slot"))
  }
}
