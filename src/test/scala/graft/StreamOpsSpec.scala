package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamOps

class StreamOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(1704067200000L + s * 1000L)

  test("windowedSummarize aggregates tumbling windows and drops late data") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val windowed = StreamOps.windowedSummarize(
      input.toDF().toDF("ts", "k", "v"),
      "ts", "1 minute", "2 minutes",
      groupBy = Seq(col("k")),
      aggs = Seq(count(lit(1)).as("n"), sum(col("v")).as("total")))
    val q = windowed.writeStream.format("memory").queryName("win")
      .outputMode("append").start()
    try {
      input.addData((ts(10), "a", 1.0), (ts(20), "a", 2.0), (ts(70), "b", 5.0))
      q.processAllAvailable()
      // advance watermark far: first windows close
      input.addData((ts(400), "a", 9.0))
      q.processAllAvailable()
      // late event far behind the watermark: must be dropped
      input.addData((ts(15), "a", 100.0))
      q.processAllAvailable()
      input.addData((ts(800), "z", 0.0)) // close remaining windows
      q.processAllAvailable()
      val rows = spark.table("win")
        .select(col("window.start").cast("long"), col("k"), col("n"), col("total"))
        .as[(Long, String, Long, Double)].collect().toSet
      val base = 1704067200L
      assert(rows.contains((base, "a", 2L, 3.0)))      // late 100.0 NOT included
      assert(rows.contains((base + 60, "b", 1L, 5.0)))
      assert(rows.contains((base + 360, "a", 1L, 9.0)))
    } finally q.stop()
  }

  test("dedupWithinWatermark keeps first event per key") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Long)]
    val deduped = StreamOps.dedupWithinWatermark(
      input.toDF().toDF("ts", "k", "seq"), "ts", "10 minutes", Seq("k"))
    val q = deduped.writeStream.format("memory").queryName("dd")
      .outputMode("append").start()
    try {
      input.addData((ts(1), "x", 1L), (ts(2), "x", 2L), (ts(3), "y", 3L))
      q.processAllAvailable()
      input.addData((ts(4), "x", 4L), (ts(5), "z", 5L))
      q.processAllAvailable()
      val rows = spark.table("dd").select("k").as[String].collect().toSeq
      assert(rows.sorted == Seq("x", "y", "z")) // one survivor per key
    } finally q.stop()
  }
}
