package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.core.Schemas
import graft.lake.LakeTable

/** Structured-Streaming WAL tail → lake upsert.
  *
  * The WAL is a directory of parquet segment files (the sandbox Kafka
  * stand-in; on a cluster this swaps for `readStream.format("kafka")` with the
  * same `foreachBatch` body — reference analogue: `load_kafka offset=store`,
  * `plugins/kafka/builtins/plugin.cpp:85-112`). Source offsets live in the
  * Spark checkpoint; sink idempotence lives in the lake snapshot's batch-id
  * watermark — together they give exactly-once table state over an
  * at-least-once source, resumable from any checkpoint.
  */
object CdcStream {

  /** Change-envelope schema as written by the generator (seg = WAL segment). */
  val walSchema: StructType =
    StructType(Schemas.changeEvent.fields :+ StructField("seg", LongType, nullable = false))

  /** Start the CDC ingest query. `Trigger.AvailableNow` drains everything
    * currently in the WAL and stops — loop it (or use ProcessingTime) for a
    * continuous tail.
    *
    * @param maxFilesPerTrigger bounds micro-batch size (backpressure knob; the
    *        reference's demand window analogue, `execution_node.cpp:44-67`)
    * @param mode               `"cow"` (read-optimized copy-on-write MERGE),
    *                           `"mor"` (merge-on-read append of batch-deduped
    *                           LWW winners; [[CdcApply.applyBatchAppend]]), or
    *                           `"morraw"` (LSM-style raw append, dedup wholly
    *                           deferred to read/compaction;
    *                           [[CdcApply.applyBatchAppendRaw]]), or `"l0"`
    *                           (raw append as spanning L0 files — no bucket
    *                           shuffle at all, bucket placement deferred to
    *                           compaction; the write-optimized headline path)
    * @param autoCompactFilesPerBucket when > 0, after a batch commit any
    *        bucket holding more than this many delta files triggers a partial
    *        compaction (bounded read amplification for long MOR streams;
    *        reference analogue: auto-rebuild interval, `defaults.hpp:227`)
    * @param expireKeepLast     when > 0, retain only this many snapshots after
    *        each compaction, deleting expired manifests and any data file no
    *        retained snapshot references (incl. crash orphans)
    * @param onBatch            test/metrics hook invoked after each batch:
    *        published batches report the PUBLISHED version; a rejected batch
    *        reports `quarantined = true` with its real counts
    * @param audit              AUDITED INGEST (write-audit-publish per
    *        micro-batch; append modes `morraw`/`l0` only, and requires
    *        `quarantineDir` — rejecting with no durable record would be
    *        silent data loss). Each batch lands as a STAGED commit under a
    *        run-scoped WAP id (`<queryId>-b<batch>-<checkpoint hash>`, so a
    *        stale stage from an abandoned run can never be mistaken for this
    *        run's batch), the predicate runs against the staged table state
    *        (`pages` over the staged snapshot — base plus only this batch's
    *        effect) plus the batch's real ApplyStats, and `true` publishes
    *        while `false` QUARANTINES: the raw batch is written to
    *        `quarantineDir/batch-<id>` (overwrite — replay-idempotent) for
    *        triage and the stage is dropped, excluding the batch from the
    *        table permanently (its watermark never advances, but later
    *        batches do — the deliberate gap IS the quarantine record's
    *        meaning). Crash-safe at every window: crash after stage → replay
    *        finds the stage pending and resumes at the audit with the SAME
    *        stats (reconstructed from the staged lineage); after publish →
    *        replay skips on the watermark; after drop → replay re-stages,
    *        re-audits, re-quarantines over the same dir.
    * @param quarantineDir      where rejected batches land, one parquet dir
    *        per batch id
    */
  def start(
      spark: SparkSession,
      walDir: String,
      table: LakeTable,
      checkpointDir: String,
      queryId: String = "cdc",
      maxFilesPerTrigger: Int = 8,
      createBuckets: Int = 64,
      mode: String = "cow",
      autoCompactFilesPerBucket: Int = 0,
      expireKeepLast: Int = 0,
      onBatch: ApplyStats => Unit = _ => (),
      audit: Option[(DataFrame, ApplyStats) => Boolean] = None,
      quarantineDir: Option[String] = None): StreamingQuery = {
    require(audit.isEmpty || mode == "morraw" || mode == "l0",
      s"audited ingest requires an append mode (morraw/l0), not '$mode'")
    require(audit.isEmpty || quarantineDir.isDefined,
      "audited ingest requires a quarantineDir — rejecting a batch with no durable record is silent data loss")
    // run-scoped WAP id: stable across RESUMES of this checkpoint (replay
    // finds its own pending stage), distinct across runs (a fresh checkpoint
    // restarts batch numbering — a stale stage must not alias the new batch)
    val runTag = java.util.UUID
      .nameUUIDFromBytes(checkpointDir.getBytes("UTF-8")).toString.take(8)
    def wapId(batchId: Long): String = s"$queryId-b$batchId-$runTag"
    val apply: (DataFrame, Long) => ApplyStats = mode match {
      case "cow" => (b, id) => CdcApply.applyBatch(table, b, queryId, id, createBuckets)
      case "mor" => (b, id) => CdcApply.applyBatchAppend(table, b, queryId, id, createBuckets)
      case "morraw" => (b, id) => CdcApply.applyBatchAppendRaw(table, b, queryId, id,
        createBuckets, stageAs = audit.map(_ => wapId(id)))
      case "l0" => (b, id) =>
        CdcApply.applyBatchAppendRaw(table, b, queryId, id, createBuckets, spanning = true,
          stageAs = audit.map(_ => wapId(id)))
      case other => throw new IllegalArgumentException(s"unknown CDC mode '$other'")
    }
    spark.readStream
      .schema(walSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(walDir)
      .writeStream
      .queryName(queryId)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        var stats = apply(batch, batchId)
        audit.foreach { check =>
          val id = wapId(batchId)
          // run the gate whenever the stage is pending — including a replay
          // that skipped the (already-staged) apply after a crash mid-audit;
          // the skip path reconstructed the batch's real stats for `check`
          if (table.stagedIds.contains(id)) {
            if (check(table.pages(table.stagedSnapshot(id)), stats)) {
              val published = table.publishStaged(id)
              stats = stats.copy(skipped = false, version = published.version)
            } else {
              quarantineDir.foreach(q => batch.write.mode("overwrite")
                .parquet(s"$q/batch-$batchId"))
              table.dropStaged(id)
              stats = stats.copy(quarantined = true)
            }
          }
        }
        onBatch(stats)
        if (autoCompactFilesPerBucket > 0) {
          val snap = table.currentSnapshot.get
          val worst = snap.files.groupBy(_.bucket).values.map(_.size).maxOption.getOrElse(0)
          if (worst > autoCompactFilesPerBucket) {
            table.compact(maxFilesPerBucket = autoCompactFilesPerBucket)
            if (expireKeepLast > 0) table.expireSnapshots(expireKeepLast)
          }
        }
        ()
      }
      .start()
  }

  /** Follow the table's committed versions as a CHANGE STREAM — the
    * downstream-consumption loop over [[LakeTable.changes]] (Delta CDF /
    * Iceberg incremental-read pattern): diff the consumer's cursor against
    * the current head, hand the changelog to `onChanges(df, from, to)`, and
    * return the advanced cursor (the head consumed). One poll per call
    * (AvailableNow-style; loop for a continuous follow). No-op — cursor
    * returned unchanged, `onChanges` not invoked — when the head hasn't
    * advanced.
    *
    * Exactly-once consumption: the cursor is the consumer's checkpoint.
    * `changes()` is a pure function of the two snapshots, so a crash before
    * the cursor persists re-delivers the IDENTICAL changelog and any
    * idempotent downstream sink reconverges — the same watermark discipline
    * as the ingest side, mirrored at the output.
    *
    * Retention interplay: `start`'s auto-maintenance runs
    * [[LakeTable.expireSnapshots]], which can delete the snapshot a lagging
    * cursor points at — `changes(cursor, head)` would then throw on EVERY
    * poll with no way out. Two defenses:
    *   - `pinTag`: after each delivery the consumed head is pinned under
    *     this tag (the lag protection: the next poll's diff base survives
    *     arbitrary lag), and the PREVIOUS base stays pinned under
    *     `<tag>.prev` until the next poll acks it (the crash protection: a
    *     consumer that dies between delivery and persisting cursor=head
    *     re-polls from the old cursor, which must still exist for the
    *     identical-redelivery contract to hold). Both exempt from expiry
    *     (Iceberg ref-retention); at most two versions pinned per
    *     follower.
    *   - if the cursor version is gone anyway (an unpinned consumer
    *     outlagged retention), the poll degrades to a RE-BOOTSTRAP: the full
    *     live state at head is delivered as inserts
    *     ([[LakeTable.changesBootstrap]]) with `from = -1` so the consumer
    *     can tell — it must REPLACE its replica (truncate-and-load), not
    *     merge: a full state as inserts cannot express deletions that
    *     happened beyond retention. cursor = 0 (fresh consumer, version 0
    *     expired) takes the same path.
    */
  def followChanges(table: LakeTable, cursor: Long,
      pinTag: Option[String] = None, withPreimages: Boolean = false)
      (onChanges: (DataFrame, Long, Long) => Unit): Long = {
    val head = table.currentSnapshot.map(_.version).getOrElse(cursor)
    if (head <= cursor) return cursor
    val exists = table.versionExists(cursor)
    val (diff, fromV) =
      if (exists) (table.changes(cursor, head, withPreimages), cursor)
      else (table.changesBootstrap(head), -1L) // inserts-only: both conventions
    onChanges(diff, fromV, head)
    // Two pins, because two versions need protection: `head` for the LAG
    // window (the next poll's diff base once the consumer persists
    // cursor=head), and the OLD cursor for the CRASH window — the consumer
    // may die between this return and persisting its cursor, and the
    // identical-redelivery contract requires the version it will re-poll
    // from to still exist. Pinning only head (the old behavior) un-pinned
    // exactly that version. `<tag>.prev` advances to the new base on the
    // NEXT poll — polling from a version is the ack that it was persisted.
    // Prev first, so a crash between the two tag writes never leaves the
    // re-poll base unpinned.
    pinTag.foreach { t =>
      table.tag(s"$t.prev", if (exists) cursor else head)
      table.tag(t, head)
    }
    head
  }

  /** Drain the WAL completely and return the number of committed batches. */
  def runToCompletion(
      spark: SparkSession,
      walDir: String,
      table: LakeTable,
      checkpointDir: String,
      queryId: String = "cdc",
      maxFilesPerTrigger: Int = 8,
      createBuckets: Int = 64): Long = {
    var batches = 0L
    val q = start(spark, walDir, table, checkpointDir, queryId, maxFilesPerTrigger,
      createBuckets, onBatch = _ => batches += 1)
    q.awaitTermination()
    batches
  }
}
