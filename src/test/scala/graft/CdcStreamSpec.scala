package graft

import org.apache.spark.sql.streaming.StreamingQueryException

import graft.cdc.CdcStream
import graft.gen.{ChangeGen, GenConfig}
import graft.lake.LakeTable

class CdcStreamSpec extends SparkSpec {

  val cfg = GenConfig(events = 6000, segmentSize = 512)
  lazy val golden = expectedMap(ChangeGen.events(spark, cfg).collect().toSeq)

  test("streaming WAL tail drains to the golden final state") {
    val wal = tmpDir("wal"); val ckpt = tmpDir("ckpt")
    ChangeGen.writeWal(spark, cfg, wal)
    val table = new LakeTable(spark, tmpDir("lake"))
    val batches = CdcStream.runToCompletion(spark, wal, table, ckpt,
      maxFilesPerTrigger = 6, createBuckets = 16)
    assert(batches > 2, s"want multiple micro-batches, got $batches")
    assert(pagesMap(table.pages()) == golden)
    // lineage was recorded per batch with the source lsn range
    val lin = table.currentSnapshot.get.lineage
    assert(lin.nonEmpty && lin.forall(_.queryId == "cdc"))
    assert(lin.map(_.events).sum >= cfg.events)
  }

  test("WAP run identity lives IN the checkpoint: resume keeps it, wipe mints anew") {
    val wal = tmpDir("wal"); val ckpt = tmpDir("ckpt"); val quar = tmpDir("quar")
    ChangeGen.writeWal(spark, GenConfig(events = 1000, segmentSize = 500), wal)
    val table = new LakeTable(spark, tmpDir("lake"))
    def run(): Unit =
      CdcStream.start(spark, wal, table, ckpt, queryId = "rid", mode = "l0",
        maxFilesPerTrigger = 4, createBuckets = 4,
        audit = Some((_, _) => true), quarantineDir = Some(quar))
        .awaitTermination()
    def marker(): String =
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$ckpt/graft-run-id")), "UTF-8").trim
    run()
    val id1 = marker()
    assert(id1.matches("[0-9a-f-]{8}"))
    run() // resume over the same checkpoint: identity must not change
    assert(marker() == id1)
    // wiping the checkpoint mints a FRESH identity — a wiped run's stale
    // stages can never alias the new run's batch numbering
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    run()
    assert(marker() != id1)
  }

  test("audited ingest: rejected batch is quarantined, the rest publish and converge") {
    import org.apache.spark.sql.functions.col
    val wal = tmpDir("wal"); val ckpt = tmpDir("ckpt"); val quar = tmpDir("quar")
    ChangeGen.writeWal(spark, cfg, wal)
    val table = new LakeTable(spark, tmpDir("lake"))
    var audited = 0
    val reported = scala.collection.mutable.ArrayBuffer.empty[graft.cdc.ApplyStats]
    val q = CdcStream.start(spark, wal, table, ckpt, queryId = "aud",
      maxFilesPerTrigger = 4, createBuckets = 16, mode = "morraw",
      audit = Some { (pages, stats) =>
        audited += 1
        // the gate sees the staged state (base + this batch only): reject
        // batch 1, accept the rest
        assert(pages.columns.contains("url"))
        stats.batchId != 1L
      },
      quarantineDir = Some(quar),
      onBatch = reported += _)
    q.awaitTermination()
    assert(audited > 2)
    // onBatch distinguishes outcomes: the rejected batch is flagged, the
    // published ones carry their PUBLISHED (post-stage) versions
    assert(reported.count(_.quarantined) == 1 &&
      reported.find(_.quarantined).get.batchId == 1L)
    val published = reported.filter(s => !s.quarantined && s.events > 0)
    assert(published.forall(s => table.versionExists(s.version)))
    // quarantine holds exactly the rejected batch's raw events; its WAL
    // segments identify which DELIVERIES were dropped (an at-least-once
    // duplicate of the same event arriving in another batch still applies).
    // The record is scoped like the WAP id (<queryId>-b<batch>-<runTag>) so
    // two streams or re-started runs sharing a dir can't clobber each other.
    val quarDirs = new java.io.File(quar).listFiles().map(_.getName)
    assert(quarDirs.length == 1 && quarDirs.head.matches("aud-b1-[0-9a-f-]{8}"),
      quarDirs.toSeq.toString)
    val quarSegs = spark.read.parquet(s"$quar/${quarDirs.head}")
      .select("seg").distinct().collect().map(_.getLong(0)).toSet
    assert(quarSegs.nonEmpty)
    assert(table.stagedIds.isEmpty, "no stage left pending")
    // final state = LWW over every delivery EXCEPT the quarantined segments
    val allEvents = ChangeGen.events(spark, cfg).collect().toSeq
    val expected = expectedMap(allEvents.filterNot(e => quarSegs.contains(e.seg)))
    assert(pagesMap(table.pages()) == expected)
    // the quarantined batch never advanced the watermark, later ones did
    val lin = table.lineageLog.filter(_.queryId == "aud")
    assert(!lin.exists(_.batchId == 1L) && lin.exists(_.batchId >= 2L))
    // a resumed run is a no-op: nothing re-applies, state unchanged
    val q2 = CdcStream.start(spark, wal, table, ckpt, queryId = "aud",
      maxFilesPerTrigger = 4, createBuckets = 16, mode = "morraw",
      audit = Some((_, _) => true), quarantineDir = Some(quar))
    q2.awaitTermination()
    assert(pagesMap(table.pages()) == expected)
  }

  test("everything on: audited ingest + auto-compaction + expiry + pinned follower") {
    val wal = tmpDir("wal"); val ckpt = tmpDir("ckpt"); val quar = tmpDir("quar")
    ChangeGen.writeWal(spark, cfg, wal)
    val table = new LakeTable(spark, tmpDir("lake"))
    // downstream replica maintained by the changelog follower, polled
    // between batches while maintenance (compaction + expiry) runs inline
    var cursor = 0L
    var replica = Map.empty[String, String]
    def poll(): Unit =
      cursor = CdcStream.followChanges(table, cursor, pinTag = Some("f")) { (df, from, _) =>
        val rows = df.collect()
        if (from < 0)
          replica = rows.map(r => r.getAs[String]("url") -> r.getAs[String]("text")).toMap
        else rows.foreach { r =>
          val u = r.getAs[String]("url")
          if (r.getAs[String]("change_type") == "delete") replica -= u
          else replica += u -> r.getAs[String]("text")
        }
      }
    val q = CdcStream.start(spark, wal, table, ckpt, queryId = "all",
      maxFilesPerTrigger = 4, createBuckets = 16, mode = "morraw",
      autoCompactFilesPerBucket = 2, expireKeepLast = 2,
      audit = Some((_, _) => true), quarantineDir = Some(quar),
      onBatch = _ => poll())
    q.awaitTermination()
    poll() // drain the final head
    assert(table.stagedIds.isEmpty, "no stage left pending")
    assert(pagesMap(table.pages()) == golden)
    assert(replica == golden.map { case (u, (t, _, _, _)) => u -> t },
      "the follower's replica must converge through compactions and expiry")
    // auto-compaction bounded the per-bucket delta file count
    val worst = table.currentSnapshot.get.files
      .groupBy(_.bucket).values.map(_.size).max
    assert(worst <= 3, s"auto-compaction bound violated: $worst files in a bucket")
  }

  test("audited ingest: crash mid-audit resumes at the gate with the batch's real stats") {
    val wal = tmpDir("wal"); val ckpt = tmpDir("ckpt"); val quar = tmpDir("quar")
    ChangeGen.writeWal(spark, cfg, wal)
    val table = new LakeTable(spark, tmpDir("lake"))
    // run 1: crash INSIDE the audit of batch 1 — after its stage landed,
    // before publish/drop (the pending-stage crash window)
    val q1 = CdcStream.start(spark, wal, table, ckpt, queryId = "ac",
      maxFilesPerTrigger = 4, createBuckets = 16, mode = "morraw",
      audit = Some { (_, stats) =>
        if (stats.batchId == 1L) throw new RuntimeException("injected crash")
        true
      }, quarantineDir = Some(quar))
    intercept[StreamingQueryException](q1.awaitTermination())
    assert(table.stagedIds.nonEmpty, "the crashed batch's stage must be pending")
    // run 2 (same checkpoint): batch 1 replays, the apply skips onto the
    // pending stage, and the gate must see the batch's REAL counts (not the
    // zeroed skip stats) before publishing
    val resumed = scala.collection.mutable.ArrayBuffer.empty[graft.cdc.ApplyStats]
    val q2 = CdcStream.start(spark, wal, table, ckpt, queryId = "ac",
      maxFilesPerTrigger = 4, createBuckets = 16, mode = "morraw",
      audit = Some { (_, stats) =>
        if (stats.batchId == 1L) resumed += stats
        true
      }, quarantineDir = Some(quar))
    q2.awaitTermination()
    assert(resumed.exists(s => s.skipped && s.events > 0),
      s"resumed audit saw: $resumed — the skip path must reconstruct real stats")
    assert(table.stagedIds.isEmpty)
    // everything ultimately published: full golden convergence
    assert(pagesMap(table.pages()) == golden)
  }

  test("crash mid-stream, resume from checkpoint: exactly-once convergence") {
    val wal = tmpDir("wal"); val ckpt = tmpDir("ckpt")
    ChangeGen.writeWal(spark, cfg, wal)
    val table = new LakeTable(spark, tmpDir("lake"))
    // Crash AFTER the lake commit of batch 2 but BEFORE Spark checkpoints it —
    // the worst-case window; resume must skip the already-committed batch.
    var n = 0
    val q = CdcStream.start(spark, wal, table, ckpt, maxFilesPerTrigger = 4,
      createBuckets = 16, onBatch = { st =>
        n += 1
        if (n == 3) throw new RuntimeException("injected crash")
      })
    intercept[StreamingQueryException](q.awaitTermination())
    val versionAtCrash = table.currentSnapshot.get.version
    assert(versionAtCrash >= 2)

    var skips = 0
    val q2 = CdcStream.start(spark, wal, table, ckpt, maxFilesPerTrigger = 4,
      createBuckets = 16, onBatch = st => if (st.skipped) skips += 1)
    q2.awaitTermination()
    assert(skips >= 1, "the replayed in-flight batch must be watermark-skipped")
    assert(pagesMap(table.pages()) == golden)

    // replaying the WHOLE stream from a fresh checkpoint against the same
    // table also converges (idempotent re-apply of every batch)
    val q3 = CdcStream.start(spark, wal, table, tmpDir("ckpt2"), maxFilesPerTrigger = 4,
      createBuckets = 16)
    q3.awaitTermination()
    assert(pagesMap(table.pages()) == golden)
  }
}
