package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** `publish`/`subscribe` — the reference's in-node topic bus
  * (`/root/reference/libtenzir/builtins/operators/publish.cpp`,
  * `subscribe.cpp`: named channels decoupling producer pipelines from any
  * number of consumer pipelines, fan-in and fan-out both allowed).
  *
  * Spark mapping: a topic is a directory of append-only parquet segments —
  * the same durable-log shape our WAL source uses. Producers `publish`
  * micro-batches (or whole frames) into the topic; consumers either
  * `subscribe` (batch: read everything so far) or `subscribeStream`
  * (streaming tail via the file source, exactly-once with the consumer's own
  * checkpoint). Unlike the reference's in-memory bus this survives restarts
  * and decouples producer/consumer lifetimes — on a cluster the directory
  * lives on the shared lake store.
  */
object Topics {

  /** Publish a frame (or foreachBatch micro-batch) to a topic. Multiple
    * producers may interleave — parquet part files never collide (task UUID
    * naming), matching the reference's many-publishers-one-topic contract
    * (`publish.cpp`: "Multiple pipelines may publish to the same topic").
    */
  def publish(frame: DataFrame, topicDir: String): Unit =
    frame.write.mode("append").parquet(topicDir)

  /** Batch subscribe: everything published so far. Like every reader seam,
    * the subscriber stamps `@import_time` on the frame it ingests
    * (reference table_slice.hpp:137-142) unless the publisher already did.
    */
  def subscribe(spark: SparkSession, topicDir: String): DataFrame =
    graft.core.IngestClock.stamp(spark.read.parquet(topicDir))

  /** Streaming subscribe: tail the topic; each subscriber tracks its own
    * position via its query checkpoint (fan-out: any number of independent
    * subscribers, like the reference's `subscribe.cpp` multi-consumer
    * semantics). Stamps `@import_time` like the batch twin — per micro-batch
    * (`current_timestamp()` is batch-constant in streaming), the closest
    * streaming analogue of the reference's per-slice import time — unless
    * the publisher already attached one.
    */
  def subscribeStream(spark: SparkSession, topicDir: String, schema: StructType,
      maxFilesPerTrigger: Int = 16): DataFrame = {
    val df = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(topicDir)
    if (df.columns.contains(graft.core.IngestClock.Column)) df
    else df.withColumn(graft.core.IngestClock.Column,
      org.apache.spark.sql.functions.current_timestamp())
  }
}
