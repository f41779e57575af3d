package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ops.Shell
import graft.streaming.{StreamOps, Topics}

class ShellTopicsSpec extends SparkSpec {
  import spark.implicits._

  test("shell_ pipes lines through an external command, per partition") {
    val df = Seq("alpha", "bravo", "charlie", "delta").toDF("line").repartition(3)
    val up = Shell.shell_(df, "line", Seq("tr", "a-z", "A-Z"))
    assert(up.as[String].collect().toSet ==
      Set("ALPHA", "BRAVO", "CHARLIE", "DELTA"))
  }

  test("shell_ supports commands that drop or add lines") {
    val df = Seq("alpha", "bravo", "charlie", "delta").toDF("line").repartition(2)
    // grep filters: only lines containing "lt" survive (grep exits 1 on
    // no-match partitions — that is not an error for the stream contract)
    val filtered = Shell.shell_(df, "line", Seq("grep", "lt"))
    assert(filtered.as[String].collect().toSeq == Seq("delta"))
    // sed duplicates every line
    val doubled = Shell.shell_(df, "line", Seq("sed", "p"))
    assert(doubled.count() == 8)
  }

  test("shell_ fails the task on a crashing child (exit outside the ok set)") {
    val df = Seq("alpha", "bravo").toDF("line").coalesce(1)
    // grep exit 2 = real error (bad pattern), beyond the tolerated no-match 1
    val bad = Shell.shell_(df, "line", Seq("grep", "-E", "(unclosed"))
    val e = intercept[Exception](bad.collect())
    val messages = Iterator.iterate[Throwable](e)(_.getCause)
      .takeWhile(_ != null).take(10).flatMap(t => Option(t.getMessage)).mkString("\n")
    assert(messages.contains("exited 2"), messages.take(300))
  }

  test("publish/subscribe: batch fan-in and fan-out over a topic") {
    val topic = tmpDir("topic")
    try {
      Topics.publish(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), topic)
      Topics.publish(Seq((3L, "c")).toDF("id", "v"), topic) // second producer
      val sub = Topics.subscribe(spark, topic)
      // the reader seam stamps @import_time (IngestClock) on what it ingests
      assert(sub.columns.contains("@import_time"))
      assert(sub.filter(col("`@import_time`").isNull).count() == 0)
      val got = sub.select("id", "v").as[(Long, String)].collect().toSet
      assert(got == Set((1L, "a"), (2L, "b"), (3L, "c")))
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(topic))
  }

  test("subscribeStream tails a topic across later publishes") {
    val topic = tmpDir("topicstream")
    try {
      val schema = Seq((0L, "")).toDF("id", "v").schema
      Topics.publish(Seq((1L, "a")).toDF("id", "v"), topic)
      val q = Topics.subscribeStream(spark, topic, schema)
        .writeStream.format("memory").queryName("sub").outputMode("append").start()
      try {
        q.processAllAvailable()
        Topics.publish(Seq((2L, "b"), (3L, "c")).toDF("id", "v"), topic)
        q.processAllAvailable()
        // streaming subscribers stamp @import_time per micro-batch too
        assert(spark.table("sub").columns.contains("@import_time"))
        assert(spark.table("sub").filter(col("`@import_time`").isNull).count() == 0)
        val got = spark.table("sub").select("id", "v").as[(Long, String)].collect().toSet
        assert(got == Set((1L, "a"), (2L, "b"), (3L, "c")))
      } finally q.stop()
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(topic))
  }

  test("delayedSink paces batches by event-time cadence") {
    implicit val sqlCtx = spark.sqlContext
    val t0 = 1704067200000L
    val input = MemoryStream[(Timestamp, Long)]
    val emitted = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)] // (batch, wallMs)
    val paced = StreamOps.delayedSink("ts", speed = 4.0,
      (batch, id) => emitted.synchronized { emitted += ((id, System.currentTimeMillis())) })
    val q = input.toDF().toDF("ts", "v").writeStream
      .foreachBatch(paced).start()
    try {
      input.addData((new Timestamp(t0), 1L))
      q.processAllAvailable()
      // second batch is 2 event-seconds later; at speed=4 it may emit no
      // earlier than ~500 ms after the anchor batch
      input.addData((new Timestamp(t0 + 2000L), 2L))
      q.processAllAvailable()
    } finally q.stop()
    val byBatch = emitted.sortBy(_._1).map(_._2)
    assert(byBatch.size == 2)
    assert(byBatch(1) - byBatch(0) >= 400L,
      s"second batch emitted only ${byBatch(1) - byBatch(0)} ms after first")
  }

  test("throttledSink caps the cumulative event rate across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Long]
    val emitted = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)] // (batch, wallMs)
    val capped = StreamOps.throttledSink(200.0,
      (batch, id) => emitted.synchronized { emitted += ((id, System.currentTimeMillis())) })
    val q = input.toDF().writeStream.foreachBatch(capped).start()
    try {
      input.addData(1L to 100L: _*) // batch 0: ships immediately, spends 0.5s budget
      q.processAllAvailable()
      input.addData(101L to 200L: _*) // batch 1: must wait until ≥0.5s elapsed
      q.processAllAvailable()
      input.addData(201L to 300L: _*) // batch 2: must wait until ≥1.0s elapsed
      q.processAllAvailable()
    } finally q.stop()
    val byBatch = emitted.sortBy(_._1).map(_._2)
    assert(byBatch.size == 3)
    assert(byBatch(1) - byBatch(0) >= 400L,
      s"batch 1 shipped ${byBatch(1) - byBatch(0)} ms after batch 0 — rate cap not applied")
    assert(byBatch(2) - byBatch(0) >= 900L,
      s"batch 2 shipped ${byBatch(2) - byBatch(0)} ms after batch 0 — cumulative cap not applied")
  }

  test("boundedSink (buffer policy=drop) keeps a deterministic subset and reports drops") {
    val big = spark.range(100).toDF("value")
    val small = spark.range(3).toDF("value")
    val shipped = scala.collection.mutable.ArrayBuffer.empty[Set[Long]]
    val drops = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val bounded = StreamOps.boundedSink(5, Seq("value"),
      (b, _) => shipped += b.collect().map(_.getLong(0)).toSet,
      (id, n) => drops += ((id, n)))
    bounded(big, 0L); bounded(small, 1L); bounded(big, 2L)
    assert(shipped(0).size == 5 && shipped(1).size == 3 && shipped(2).size == 5)
    assert(drops.toSeq == Seq((0L, 95L), (2L, 95L))) // under-bound batch: no drop event
    assert(shipped(0) == shipped(2), "same input must drop the same rows (replay-deterministic)")
  }
}
