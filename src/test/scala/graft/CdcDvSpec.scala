package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions.col

import graft.cdc.CdcApply
import graft.gen.{ChangeGen, GenConfig, GenEvent}
import graft.lake.LakeTable

/** Deletion-vector apply mode ([[CdcApply.applyBatchDv]]): positional delete
  * sidecars + winner appends must converge to the same LWW state as every
  * other mode, while maintaining the single-live-version invariant that lets
  * reads skip the resolve shuffle entirely.
  */
class CdcDvSpec extends SparkSpec {
  import spark.implicits._

  val cfg = GenConfig(events = 8000, segmentSize = 512)
  lazy val allEvents: Seq[GenEvent] = ChangeGen.events(spark, cfg).collect().toSeq
  lazy val golden: Map[String, (String, String, Long, Int)] = expectedMap(allEvents)

  private def replayDv(table: LakeTable, groups: Seq[Seq[GenEvent]], queryId: String): Unit =
    groups.zipWithIndex.foreach { case (g, i) =>
      CdcApply.applyBatchDv(table, spark.createDataset(g).toDF(), queryId, i.toLong,
        createBuckets = 16)
    }

  private def segGroups(events: Seq[GenEvent], segsPerBatch: Int): Seq[Seq[GenEvent]] =
    events.groupBy(_.seg / segsPerBatch).toSeq.sortBy(_._1).map(_._2)

  test("dv replay converges to the independent final state; reads need no resolve") {
    val table = new LakeTable(spark, tmpDir())
    replayDv(table, segGroups(allEvents, 8), "q")
    val snap = table.currentSnapshot.get
    assert(!table.needsResolve(snap), "dv mode must not set needs_resolve")
    assert(snap.dvFiles.nonEmpty, "a multi-batch update stream must have masked rows")
    assert(pagesMap(table.pages(snap)) == golden)
    // the invariant that makes the no-resolve read correct: at most one
    // UNMASKED row per url across the whole table
    val dupes = table.scanRaw(snap).groupBy(col("url"))
      .count().filter(col("count") > 1).count()
    assert(dupes == 0, s"$dupes urls hold more than one unmasked version")
  }

  test("out-of-order replay (stale late batches) reaches the same state") {
    // apply the lsn windows in REVERSE: every batch after the first is
    // entirely stale vs the committed state, so the loser path (batch rows
    // discarded, no mask written) carries the whole convergence
    val table = new LakeTable(spark, tmpDir())
    val groups = segGroups(allEvents, 8).reverse
    replayDv(table, groups, "q")
    val snap = table.currentSnapshot.get
    assert(pagesMap(table.pages(snap)) == golden)
    val dupes = table.scanRaw(snap).groupBy(col("url"))
      .count().filter(col("count") > 1).count()
    assert(dupes == 0)
  }

  test("stale update after a delete stays dead; equal-lsn redelivery keeps the committed row") {
    val table = new LakeTable(spark, tmpDir())
    val ts = new Timestamp(1704067200000L)
    def ev(op: String, lsn: Long, part: Int, url: String, text: String): GenEvent =
      GenEvent(op, lsn, part, url, ts,
        if (op == "D") null else text.getBytes("UTF-8"),
        if (op == "D") null else text, if (op == "D") null else "en", 0L)
    val b0 = Seq(ev("I", 1, 0, "https://a/x", "v1"), ev("I", 2, 0, "https://a/y", "w1"))
    val b1 = Seq(ev("D", 10, 1, "https://a/x", null))
    // stale update (lsn 5 < 10) + equal-lsn redelivery of u2@2 + real update
    val b2 = Seq(ev("U", 5, 2, "https://a/x", "stale"),
      ev("U", 2, 0, "https://a/y", "redelivered"),
      ev("U", 11, 1, "https://a/y", "w2"))
    Seq(b0, b1, b2).zipWithIndex.foreach { case (b, i) =>
      CdcApply.applyBatchDv(table, spark.createDataset(b).toDF(), "q", i.toLong,
        createBuckets = 4)
    }
    val rows = table.pages().collect()
      .map(r => r.getAs[String]("url") -> r.getAs[String]("text")).toMap
    assert(rows == Map("https://a/y" -> "w2"))
  }

  test("point lookup prunes and sees through the mask") {
    val table = new LakeTable(spark, tmpDir())
    replayDv(table, segGroups(allEvents, 8), "q")
    val snap = table.currentSnapshot.get
    val url = golden.keysIterator.next()
    val row = table.lookupUrl(snap, url).collect()
    assert(row.length == 1 && row(0).getAs[String]("text") == golden(url)._1)
  }

  test("full compaction folds masks into the data and clears the sidecar list") {
    val table = new LakeTable(spark, tmpDir())
    replayDv(table, segGroups(allEvents, 4), "q")
    val before = table.currentSnapshot.get
    assert(before.dvFiles.nonEmpty)
    val snap = table.compact(maxFilesPerBucket = 1)
    assert(snap.dvFiles.isEmpty, "full compaction must clear the DV list")
    assert(pagesMap(table.pages(snap)) == golden)
    // time travel: the pre-compaction snapshot still reads masked
    assert(pagesMap(table.pages(table.snapshotAt(before.version))) == golden)
  }

  test("partial compaction consolidates the DV list to surviving files only") {
    val table = new LakeTable(spark, tmpDir())
    replayDv(table, segGroups(allEvents, 2), "q") // many small commits
    val before = table.currentSnapshot.get
    assert(before.dvFiles.nonEmpty)
    val snap = table.compact(maxFilesPerBucket = 2)
    assert(pagesMap(table.pages(snap)) == golden)
    if (snap.dvFiles.nonEmpty) {
      // every surviving entry must point at a file that still exists
      val live = snap.files.map(f => LakeTable.normalizePath(f.path)).toSet
      val entries = spark.read.schema(LakeTable.dvSchema)
        .parquet(snap.dvFiles.map(_.path): _*)
        .select(col(LakeTable.DvPathCol)).distinct().as[String].collect()
      entries.foreach { p =>
        val norm = p.replaceFirst("^[a-z][a-zA-Z0-9+.-]*:/+", "/")
        assert(live.contains(norm), s"dangling DV entry for $p")
      }
      // consolidated masks must still hide exactly the superseded rows
      val dupes = table.scanRaw(snap).groupBy(col("url"))
        .count().filter(col("count") > 1).count()
      assert(dupes == 0)
    }
  }

  test("changes() over dv versions classifies inserts/updates/deletes") {
    val table = new LakeTable(spark, tmpDir())
    val groups = segGroups(allEvents, 8)
    var vFrom = -1L
    groups.zipWithIndex.foreach { case (g, i) =>
      CdcApply.applyBatchDv(table, spark.createDataset(g).toDF(), "q", i.toLong,
        createBuckets = 16)
      if (i == 0) vFrom = table.currentSnapshot.get.version
    }
    val vTo = table.currentSnapshot.get.version
    val got = table.changes(vFrom, vTo).collect()
      .map(r => r.getAs[String]("url") ->
        (r.getAs[String]("change_type"), r.getAs[String]("text"))).toMap
    // independent twin: LWW state after the first window vs the final state
    val s1 = expectedState(groups.head)
    val s2 = expectedState(allEvents)
    val all1 = { // including tombstone winners, for update-vs-insert classing
      val m = scala.collection.mutable.Map.empty[String, GenEvent]
      groups.head.sortBy(e => (e.lsn, e.wal_part)).foreach(e => m(e.url) = e)
      m.toMap
    }
    val expected = (s1.keySet ++ s2.keySet).flatMap { url =>
      (s1.get(url), s2.get(url)) match {
        case (None, Some(e)) => Some(url -> ("insert", e.text))
        case (Some(p), None) => Some(url -> ("delete", p.text))
        case (Some(p), Some(e)) if (p.lsn, p.wal_part) != (e.lsn, e.wal_part) =>
          Some(url -> ("update", e.text))
        case _ =>
          // urls dead at BOTH versions can still differ (tombstone advanced) —
          // the changelog contract only covers live-state change, and the
          // implementation emits nothing for dead→dead; ignore
          None
      }
    }.toMap
    assert(got == expected)
  }

  test("expiry keeps referenced sidecars; orphaned ones are swept after compaction") {
    val table = new LakeTable(spark, tmpDir())
    replayDv(table, segGroups(allEvents, 4), "q")
    val withDv = table.currentSnapshot.get
    assert(withDv.dvFiles.nonEmpty)
    // expire down to the head only: its sidecars must survive
    table.expireSnapshots(keepLast = 1)
    assert(pagesMap(table.pages(table.currentSnapshot.get)) == golden)
    // full compaction drops the DV list; expiry may then sweep the sidecars
    table.compact(maxFilesPerBucket = 1)
    table.expireSnapshots(keepLast = 1)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sessionState.newHadoopConf())
    withDv.dvFiles.foreach { dv =>
      assert(!fs.exists(new org.apache.hadoop.fs.Path(dv.path)),
        s"orphaned sidecar ${dv.path} survived the sweep")
    }
    assert(pagesMap(table.pages(table.currentSnapshot.get)) == golden)
  }

  test("schema evolution applies mid-stream in dv mode") {
    val table = new LakeTable(spark, tmpDir())
    val ts = new Timestamp(1704067200000L)
    val b0 = Seq(("I", 1L, 0, "https://s/1", ts, "t1", "en", 7))
      .toDF("op", "lsn", "wal_part", "url", "warc_ts", "text", "lang", "score")
    val b1 = Seq(
      ("I", 2L, 0, "https://s/2", ts, "t2", "en", 123456789012L, 200),
      ("U", 3L, 0, "https://s/1", ts, "t1b", "en", 5L, 304))
      .toDF("op", "lsn", "wal_part", "url", "warc_ts", "text", "lang", "score", "fetch_status")
    CdcApply.applyBatchDv(table, b0, "q", 0L, createBuckets = 4)
    CdcApply.applyBatchDv(table, b1, "q", 1L, createBuckets = 4)
    val schema = table.currentFileSchema(table.currentSnapshot.get)
    assert(schema("score").dataType == org.apache.spark.sql.types.LongType)
    assert(schema.fieldNames.contains("fetch_status"))
    val rows = table.pages().collect()
      .map(r => r.getAs[String]("url") ->
        (r.getAs[String]("text"), r.getAs[Long]("score"))).toMap
    assert(rows == Map("https://s/1" -> ("t1b", 5L), "https://s/2" -> ("t2", 123456789012L)))
  }

  test("dv apply refuses a multi-version (merge-on-read) base") {
    val table = new LakeTable(spark, tmpDir())
    val g = segGroups(allEvents, 8)
    CdcApply.applyBatchAppend(table, spark.createDataset(g.head).toDF(), "q", 0L,
      createBuckets = 16)
    val e = intercept[IllegalArgumentException] {
      CdcApply.applyBatchDv(table, spark.createDataset(g(1)).toDF(), "q", 1L,
        createBuckets = 16)
    }
    assert(e.getMessage.contains("single-version base"))
    // after a full compaction the base is single-version again → dv applies
    table.compact(maxFilesPerBucket = 1)
    CdcApply.applyBatchDv(table, spark.createDataset(g(1)).toDF(), "q", 1L,
      createBuckets = 16)
    assert(pagesMap(table.pages()) == expectedMap(g.head ++ g(1)))
  }

  test("mask correctness survives the shuffled anti-join fallback (DvBroadcastLimit=0)") {
    sys.props("graft.dvBroadcastLimit") = "0" // force the non-broadcast path
    try {
      val table = new LakeTable(spark, tmpDir())
      replayDv(table, segGroups(allEvents, 8), "q")
      val snap = table.currentSnapshot.get
      assert(snap.dvFiles.nonEmpty)
      assert(pagesMap(table.pages(snap)) == golden)
      val dupes = table.scanRaw(snap).groupBy(col("url"))
        .count().filter(col("count") > 1).count()
      assert(dupes == 0)
    } finally { sys.props.remove("graft.dvBroadcastLimit"); () }
  }

  test("streaming dv mode: checkpoint resume applies nothing; auto-compaction folds masks") {
    val work = tmpDir()
    val wal = s"$work/wal"
    graft.gen.ChangeGen.writeWal(spark,
      graft.gen.GenConfig(events = 8000, segmentSize = 512), wal)
    val table = new LakeTable(spark, s"$work/lake")
    var applied = 0
    graft.cdc.CdcStream.start(spark, wal, table, s"$work/ckpt",
      maxFilesPerTrigger = 4, createBuckets = 16, mode = "dv",
      autoCompactFilesPerBucket = 3,
      onBatch = st => if (!st.skipped) applied += 1).awaitTermination()
    assert(applied > 1)
    val snap = table.currentSnapshot.get
    assert(pagesMap(table.pages(snap)) == golden)
    // auto-compaction ran mid-stream: per-bucket file counts are bounded and
    // the consolidated DV list reflects only still-live files
    assert(snap.files.groupBy(_.bucket).values.forall(_.size <= 3 + 1))
    // checkpoint resume: nothing new to apply, state unchanged
    var applied2 = 0
    graft.cdc.CdcStream.start(spark, wal, table, s"$work/ckpt",
      maxFilesPerTrigger = 4, createBuckets = 16, mode = "dv",
      onBatch = st => if (!st.skipped) applied2 += 1).awaitTermination()
    assert(applied2 == 0)
    assert(pagesMap(table.pages()) == golden)
  }

  test("exactly-once watermark skips a replayed dv batch") {
    val table = new LakeTable(spark, tmpDir())
    val groups = segGroups(allEvents, 8)
    replayDv(table, groups, "q")
    val before = table.currentSnapshot.get
    val st = CdcApply.applyBatchDv(table, spark.createDataset(groups(1)).toDF(), "q", 1L)
    assert(st.skipped)
    assert(table.currentSnapshot.get.version == before.version)
    assert(pagesMap(table.pages()) == golden)
  }
}
