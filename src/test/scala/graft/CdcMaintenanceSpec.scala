package graft

import org.apache.spark.sql.functions.col

import graft.cdc.{CdcApply, CdcStream}
import graft.gen.{ChangeGen, GenConfig, GenEvent}
import graft.lake.LakeTable
import graft.ops.MatView

/** Raw (LSM-style) MOR append, auto-compaction, snapshot expiry / orphan GC,
  * and the conditional-resolve flag.
  */
class CdcMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  val cfg = GenConfig(events = 6000, segmentSize = 512)
  lazy val allEvents: Seq[GenEvent] = ChangeGen.events(spark, cfg).collect().toSeq
  lazy val golden: Map[String, (String, String, Long, Int)] = expectedMap(allEvents)

  private def segGroups(events: Seq[GenEvent], segsPerBatch: Int): Seq[Seq[GenEvent]] =
    events.groupBy(_.seg / segsPerBatch).toSeq.sortBy(_._1).map(_._2)

  test("raw append (morraw) converges to the same golden state as deduped MOR") {
    val table = new LakeTable(spark, tmpDir())
    segGroups(allEvents, 6).zipWithIndex.foreach { case (g, i) =>
      CdcApply.applyBatchAppendRaw(table, spark.createDataset(g).toDF(), "r", i.toLong,
        createBuckets = 16)
    }
    assert(pagesMap(table.pages()) == golden)
    // raw lineage counts events as delivered
    assert(table.currentSnapshot.get.lineage.map(_.events).sum == allEvents.size)
  }

  test("raw append under permuted batch order still converges (LWW on read)") {
    val groups = segGroups(allEvents, 6)
    val permuted = Seq(groups.indices.reverse, scala.util.Random.shuffle(groups.indices.toList))
    // batches must commit in batchId order per query, but CONTENT can be any
    // partition of the WAL — permute which events land in which batch
    val table = new LakeTable(spark, tmpDir())
    permuted.head.zipWithIndex.foreach { case (gi, i) =>
      CdcApply.applyBatchAppendRaw(table, spark.createDataset(groups(gi)).toDF(), "p", i.toLong,
        createBuckets = 16)
    }
    assert(pagesMap(table.pages()) == golden)
  }

  test("compaction output carries a parquet bloom filter on url (row-group point pruning)") {
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.io.api.Binary
    import scala.jdk.CollectionConverters._
    val table = new LakeTable(spark, tmpDir())
    segGroups(allEvents, 6).zipWithIndex.foreach { case (g, i) =>
      CdcApply.applyBatchAppendRaw(table, spark.createDataset(g).toDF(), "b", i.toLong,
        createBuckets = 4)
    }
    table.compact(maxFilesPerBucket = 1)
    val snap = table.currentSnapshot.get
    val f = snap.files.head
    // a url that lives in this file (files are bucket-partitioned on urlhash)
    val present = table.readFiles(snap, Seq(f), table.currentFileSchema(snap))
      .select("url").head().getString(0)
    val conf = spark.sparkContext.hadoopConfiguration
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(f.path), conf))
    try {
      val block = reader.getRowGroups.get(0)
      val colMeta = block.getColumns.asScala.find(_.getPath.toDotString == "url").get
      val bloom = reader.getBloomFilterDataReader(block).readBloomFilter(colMeta)
      assert(bloom != null, "compacted file must carry a url bloom filter")
      assert(bloom.findHash(bloom.hash(Binary.fromString(present))))
    } finally reader.close()
  }

  test("changes(): insert/update/delete classification between two versions") {
    import java.sql.Timestamp
    val table = new LakeTable(spark, tmpDir())
    val ts = new Timestamp(1704067200000L)
    def ev(op: String, lsn: Long, url: String, text: String): GenEvent =
      GenEvent(op, lsn, (lsn % 4).toInt, url, ts,
        if (op == "D") null else text.getBytes("UTF-8"),
        if (op == "D") null else text, if (op == "D") null else "en", 0L)
    CdcApply.applyBatch(table, spark.createDataset(Seq(
      ev("I", 1, "u1", "a1"), ev("I", 2, "u2", "b1"), ev("I", 3, "u3", "c1")
    )).toDF(), "c", 0L, createBuckets = 4)
    val vFrom = table.currentSnapshot.get.version
    CdcApply.applyBatch(table, spark.createDataset(Seq(
      ev("U", 10, "u2", "b2"), ev("D", 11, "u3", null), ev("I", 12, "u4", "d1")
    )).toDF(), "c", 1L, createBuckets = 4)
    val vTo = table.currentSnapshot.get.version

    val got = table.changes(vFrom, vTo)
      .select("change_type", "url", "text", "lsn")
      .as[(String, String, String, Long)].collect().toSet
    assert(got == Set(
      ("update", "u2", "b2", 10L),
      ("delete", "u3", "c1", 11L),   // pre-image values, tombstone lsn
      ("insert", "u4", "d1", 12L)))  // u1 untouched → absent
    // self-diff and the empty range are empty
    assert(table.changes(vTo, vTo).isEmpty)
    assert(table.changes(vFrom, vFrom).isEmpty)
  }

  test("changes(): merging the changelog onto pages(from) reconverges to pages(to)") {
    val table = new LakeTable(spark, tmpDir())
    val groups = segGroups(allEvents, 3)
    groups.zipWithIndex.foreach { case (g, i) =>
      CdcApply.applyBatch(table, spark.createDataset(g).toDF(), "m", i.toLong,
        createBuckets = 8)
      if (i == 1) () // vMid captured below via lineage-independent snapshot read
    }
    val vTo = table.currentSnapshot.get.version
    val vMid = vTo - (groups.size - 2) // version after batch 1 (one commit per batch)
    val before = pagesMap(table.pages(table.snapshotAt(vMid)))
    val changelog = table.changes(vMid, vTo).collect()
    val merged = changelog.foldLeft(before) { (acc, r) =>
      val url = r.getAs[String]("url")
      if (r.getAs[String]("change_type") == "delete") acc - url
      else {
        val html = r.getAs[Array[Byte]]("html")
        acc + (url -> (r.getAs[String]("text"), r.getAs[String]("lang"),
          r.getAs[java.sql.Timestamp]("warc_ts").getTime,
          if (html == null) 0 else java.util.Arrays.hashCode(html)))
      }
    }
    assert(merged == pagesMap(table.pages(table.snapshotAt(vTo))))
    // every url in the changelog actually differs between the two states
    val after = pagesMap(table.pages(table.snapshotAt(vTo)))
    changelog.foreach { r =>
      val url = r.getAs[String]("url")
      assert(before.get(url) != after.get(url), s"$url emitted but unchanged")
    }
  }

  test("changes(): compaction inside the range emits nothing (layout, not data)") {
    val table = new LakeTable(spark, tmpDir())
    segGroups(allEvents, 6).zipWithIndex.foreach { case (g, i) =>
      CdcApply.applyBatchAppendRaw(table, spark.createDataset(g).toDF(), "k", i.toLong,
        createBuckets = 4)
    }
    val vBefore = table.currentSnapshot.get.version
    table.compact(maxFilesPerBucket = 1)
    val vAfter = table.currentSnapshot.get.version
    assert(vAfter > vBefore)
    assert(table.changes(vBefore, vAfter).isEmpty)
  }

  test("needs_resolve: set by appends, cleared by full compaction; COW never sets it") {
    val mor = new LakeTable(spark, tmpDir())
    segGroups(allEvents, 8).zipWithIndex.foreach { case (g, i) =>
      CdcApply.applyBatchAppendRaw(mor, spark.createDataset(g).toDF(), "q", i.toLong,
        createBuckets = 8)
    }
    assert(mor.needsResolve(mor.currentSnapshot.get))
    mor.compact(maxFilesPerBucket = 1)
    assert(!mor.needsResolve(mor.currentSnapshot.get))
    assert(pagesMap(mor.pages()) == golden) // resolve-free read is correct
    val cow = new LakeTable(spark, tmpDir())
    segGroups(allEvents, 8).zipWithIndex.foreach { case (g, i) =>
      CdcApply.applyBatch(cow, spark.createDataset(g).toDF(), "q", i.toLong, createBuckets = 8)
    }
    assert(!cow.needsResolve(cow.currentSnapshot.get))
    assert(pagesMap(cow.pages()) == golden)
  }

  test("auto-compaction bounds delta files per bucket during a streaming tail") {
    val work = tmpDir()
    ChangeGen.writeWal(spark, cfg, s"$work/wal")
    val table = new LakeTable(spark, s"$work/lake")
    CdcStream.start(spark, s"$work/wal", table, s"$work/ckpt", queryId = "ac",
      maxFilesPerTrigger = 2, createBuckets = 8, mode = "morraw",
      autoCompactFilesPerBucket = 3, expireKeepLast = 2).awaitTermination()
    val snap = table.currentSnapshot.get
    val worst = snap.files.groupBy(_.bucket).values.map(_.size).max
    assert(worst <= 4, s"worst bucket has $worst files") // ≤ threshold + current batch
    assert(pagesMap(table.pages()) == golden)
    // expiry kept only 2 snapshot versions (delta manifest files aside)
    val manifests = new java.io.File(s"$work/lake/manifests").list()
      .count(n => n.startsWith("v") && n.endsWith(".json"))
    assert(manifests <= 3, s"$manifests manifests retained")
  }

  test("compaction splits output on the row target instead of one giant file") {
    val table = new LakeTable(spark, tmpDir())
    segGroups(allEvents, 8).zipWithIndex.foreach { case (g, i) =>
      CdcApply.applyBatchAppendRaw(table, spark.createDataset(g).toDF(), "q", i.toLong,
        createBuckets = 4)
    }
    val snap = table.compact(maxFilesPerBucket = 1, maxRecordsPerFile = 200L)
    val perBucket = snap.files.groupBy(_.bucket)
    assert(perBucket.values.exists(_.size > 1), "row target should split bucket files")
    assert(snap.files.forall(_.rows <= 200L))
    assert(pagesMap(table.pages(snap)) == golden)
    // pruning stats still correct per split file: point lookups work
    val (url, exp) = golden.head
    val got = table.lookupUrl(snap, url).collect()
    assert(got.length == 1 && got(0).getAs[String]("text") == exp._1)
  }

  test("rebucket evolves the bucket count; reads, pruning, time travel intact") {
    val table = new LakeTable(spark, tmpDir())
    segGroups(allEvents, 8).zipWithIndex.foreach { case (g, i) =>
      CdcApply.applyBatchAppendRaw(table, spark.createDataset(g).toDF(), "rb", i.toLong,
        createBuckets = 8)
    }
    val before = table.currentSnapshot.get
    assert(before.buckets == 8)
    val snap = table.compact(rebucket = Some(32))
    assert(snap.buckets == 32)
    assert(snap.files.map(_.bucket).toSet.subsetOf((0 until 32).toSet))
    assert(snap.files.map(_.bucket).toSet.size > 8, "rows spread over the new buckets")
    assert(!table.needsResolve(snap))
    assert(pagesMap(table.pages()) == golden)
    // manifest pruning under the NEW count: point lookup touches few files
    val (url, exp) = golden.head
    val got = table.lookupUrl(snap, url).collect()
    assert(got.length == 1 && got(0).getAs[String]("text") == exp._1)
    // time travel: the pre-rebucket snapshot still reads with its own count
    assert(pagesMap(table.pages(table.snapshotAt(before.version))) == golden)
  }

  test("lineage log keeps full history past the snapshot tail and expiry") {
    val table = new LakeTable(spark, tmpDir(), lineageRetention = 2)
    val groups = segGroups(allEvents, 3) // 4 batches > retention 2
    groups.zipWithIndex.foreach { case (g, i) =>
      CdcApply.applyBatchAppendRaw(table, spark.createDataset(g).toDF(), "lin", i.toLong,
        createBuckets = 8)
    }
    val snap = table.currentSnapshot.get
    assert(groups.size > 2 && snap.lineage.size == 2, "snapshot carries only the tail")
    // the append-only log has every batch with its real counts and lsn range
    val log = table.lineageLog
    assert(log.map(_.batchId) == groups.indices.map(_.toLong))
    assert(log.map(_.events).sum == allEvents.size)
    assert(log.forall(e => e.minLsn <= e.maxLsn && e.snapshotVersion >= 0))
    // manifest expiry deletes old versions but never the lineage history
    table.expireSnapshots(keepLast = 1)
    assert(table.lineageLog == log)
  }

  test("appendedOnly commit hint: delta-equivalent to the diff, misuse rejected") {
    import graft.lake.{DataFile, ManifestCodec}
    val table = new LakeTable(spark, tmpDir())
    var s = table.create(graft.core.Schemas.page, buckets = 4)
    def f(i: Int) = DataFile(s"/fake/h$i.parquet", i % 4, 0, 10, 100, i, i, i, i)
    // hinted commit writes the same delta the unhinted diff would
    s = table.commit(s.copy(files = s.files :+ f(0)), appendedOnly = Some(Seq(f(0))))
    val d = ManifestCodec.deltaFromJson(java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"${table.root}/manifests/${s.manifests.last}")))
    assert(d.added.map(_.path) == Seq("/fake/h0.parquet") && d.removedPaths.isEmpty)
    // a fresh reader resolves the identical list either way
    assert(new LakeTable(spark, table.root).currentSnapshot.get.files.map(_.path)
      == Seq("/fake/h0.parquet"))
    // misuse: hinting while the snapshot also REMOVED a file fails the O(1)
    // size check instead of silently dropping the removal from the delta
    val bad = s.copy(files = Seq(f(1))) // replaces h0 with h1
    val err = intercept[IllegalArgumentException](
      table.commit(bad, appendedOnly = Some(Seq(f(1)))))
    assert(err.getMessage.contains("hint inconsistent"))
    // empty-batch form: Some(Nil) with unchanged files is a metadata commit
    s = table.currentSnapshot.get
    val s2 = table.commit(s.copy(watermarks = s.watermarks + ("q" -> 7L)),
      appendedOnly = Some(Nil))
    assert(s2.watermarks("q") == 7L)
    assert(s2.files.map(_.path) == Seq("/fake/h0.parquet"))
  }

  test("manifest-list indirection: O(batch) deltas, consolidation, resolution, GC") {
    import graft.lake.{DataFile, ManifestCodec}
    val table = new LakeTable(spark, tmpDir())
    val groups = segGroups(allEvents, 4) // 3 batches
    groups.zipWithIndex.foreach { case (g, i) =>
      CdcApply.applyBatchAppendRaw(table, spark.createDataset(g).toDF(), "mf", i.toLong,
        createBuckets = 8)
    }
    val snap = table.currentSnapshot.get
    // the snapshot JSON on disk carries NO file entries — only the chain
    val root = table.root
    val rawJson = java.nio.file.Files.readString(java.nio.file.Paths.get(
      f"$root/manifests/v${snap.version}%012d.json"))
    val base = ManifestCodec.fromJson(rawJson)
    assert(base.files.isEmpty && base.manifests.nonEmpty, "snapshot must store the manifest chain")
    // each commit's delta holds only that batch's files
    val delta2 = ManifestCodec.deltaFromJson(java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$root/manifests/${base.manifests.last}")))
    assert(delta2.added.nonEmpty && delta2.added.size < snap.files.size)
    assert(delta2.removedPaths.isEmpty)
    // a fresh instance resolves the identical file list and golden state
    val fresh = new LakeTable(spark, root)
    assert(fresh.currentSnapshot.get.files.map(_.path).sorted == snap.files.map(_.path).sorted)
    assert(pagesMap(fresh.pages()) == golden)
    // compaction records removals in its delta
    val compacted = table.compact(maxFilesPerBucket = 1)
    val lastDelta = ManifestCodec.deltaFromJson(java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$root/manifests/${compacted.manifests.last}")))
    assert(lastDelta.removedPaths.nonEmpty, "compaction must record removed files")
    assert(pagesMap(table.pages()) == golden)

    // consolidation bounds the chain: drive many metadata-only commits
    val meta = new LakeTable(spark, tmpDir())
    var s = meta.create(graft.core.Schemas.page, buckets = 4)
    var maxChain = 0
    (0 until 40).foreach { i =>
      val f = DataFile(s"/fake/f$i.parquet", i % 4, 0, 10, 100, i, i, i, i)
      s = meta.commit(s.copy(files = s.files :+ f))
      maxChain = math.max(maxChain, s.manifests.size)
    }
    assert(maxChain <= LakeTable.ManifestConsolidateEvery)
    assert(s.manifests.size < 40, "chain must have been consolidated")
    // resolution after consolidation yields every file, once
    val resolved = meta.snapshotAt(s.version)
    assert(resolved.files.map(_.path).sorted == (0 until 40).map(i => s"/fake/f$i.parquet").sorted)
    // expiry GCs delta files referenced by no retained snapshot
    meta.expireSnapshots(keepLast = 1)
    val remaining = new java.io.File(s"${meta.root}/manifests").list()
      .filter(_.startsWith("m-")).toSet
    assert(remaining == s.manifests.toSet,
      s"unreferenced deltas remain: ${remaining -- s.manifests.toSet}")
    assert(meta.currentSnapshot.get.files.size == 40)
  }

  test("expireSnapshots is safe with a RELATIVE table root (qualified sweep anchor)") {
    // regression: an unqualified sweep anchor matched nothing for relative
    // roots and wholesale-deleted every LIVE commit dir
    val rel = s"target/rel-lake-${java.util.UUID.randomUUID().toString.take(8)}"
    try {
      val table = new LakeTable(spark, rel)
      segGroups(allEvents, 6).take(2).zipWithIndex.foreach { case (g, i) =>
        CdcApply.applyBatchAppendRaw(table, spark.createDataset(g).toDF(), "rel", i.toLong,
          createBuckets = 8)
      }
      val before = pagesMap(table.pages())
      assert(before.nonEmpty)
      table.expireSnapshots(keepLast = 1)
      assert(pagesMap(table.pages()) == before,
        "sweep must not delete live data under a relative root")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(rel))
  }

  test("followChanges: cursor-driven incremental consumption reconverges downstream") {
    val table = new LakeTable(spark, tmpDir())
    var cursor = 0L
    var polls = 0
    var downstream = Map.empty[String, (String, String, Long, Int)]
    def consume(): Unit =
      cursor = CdcStream.followChanges(table, cursor) { (df, from, to) =>
        assert(from < to); polls += 1
        df.collect().foreach { r =>
          val url = r.getAs[String]("url")
          if (r.getAs[String]("change_type") == "delete") downstream -= url
          else {
            val html = r.getAs[Array[Byte]]("html")
            downstream += url -> (r.getAs[String]("text"), r.getAs[String]("lang"),
              r.getAs[java.sql.Timestamp]("warc_ts").getTime,
              if (html == null) 0 else java.util.Arrays.hashCode(html))
          }
        }
      }
    consume() // nothing committed yet: no-op
    assert(cursor == 0L && polls == 0)
    segGroups(allEvents, 4).zipWithIndex.foreach { case (g, i) =>
      CdcApply.applyBatch(table, spark.createDataset(g).toDF(), "f", i.toLong,
        createBuckets = 8)
      if (i % 2 == 1) consume() // consume every other commit (multi-version diffs)
    }
    consume()
    assert(downstream == golden) // the follower's replica converged to head
    // head unchanged: callback not invoked, cursor stays
    val before = (cursor, polls)
    consume()
    assert((cursor, polls) == before)
  }

  test("changes withPreimages: updates split into pre/post rows matching the two states") {
    val table = new LakeTable(spark, tmpDir())
    val groups = segGroups(allEvents, 8)
    CdcApply.applyBatch(table, spark.createDataset(groups.head).toDF(), "pi", 0L,
      createBuckets = 8)
    val v1 = table.currentSnapshot.get.version
    groups.tail.zipWithIndex.foreach { case (g, i) =>
      CdcApply.applyBatch(table, spark.createDataset(g).toDF(), "pi", (i + 1).toLong,
        createBuckets = 8)
    }
    val v2 = table.currentSnapshot.get.version
    val plain = table.changes(v1, v2).collect()
      .map(r => (r.getAs[String]("change_type"), r.getAs[String]("url"),
        r.getAs[String]("text"), r.getAs[Long]("lsn"))).toSet
    val pre = table.changes(v1, v2, withPreimages = true).collect()
      .map(r => (r.getAs[String]("change_type"), r.getAs[String]("url"),
        r.getAs[String]("text"), r.getAs[Long]("lsn"))).toSet
    // inserts and deletes are identical across the two conventions
    assert(plain.filter(t => t._1 == "insert" || t._1 == "delete") ==
      pre.filter(t => t._1 == "insert" || t._1 == "delete"))
    // every plain update row IS the postimage row; its url also has exactly
    // one preimage row whose values match the v1 state
    val updates = plain.filter(_._1 == "update")
    assert(updates.map { case (_, u, txt, l) => ("update_postimage", u, txt, l) } ==
      pre.filter(_._1 == "update_postimage"))
    val preImages = pre.filter(_._1 == "update_preimage")
    assert(preImages.map(_._2) == updates.map(_._2))
    val state1 = pagesMap(table.pages(table.snapshotAt(v1)))
    preImages.foreach { case (_, url, txt, _) =>
      assert(state1(url)._1 == txt, s"preimage of $url must be the v$v1 value")
    }
  }

  test("MatView: incremental fold over the changelog equals the direct aggregate") {
    import org.apache.spark.sql.functions.{col, count, length, sum}
    val table = new LakeTable(spark, tmpDir())
    var cursor = 0L
    var view: Option[org.apache.spark.sql.DataFrame] = None
    segGroups(allEvents, 6).zipWithIndex.foreach { case (g, i) =>
      CdcApply.applyBatch(table, spark.createDataset(g).toDF(), "mv", i.toLong,
        createBuckets = 8)
      cursor = CdcStream.followChanges(table, cursor, withPreimages = true) {
        (df, from, _) =>
          // bootstrap (from < 0) would mean REBUILD from None, never merge
          val base = if (from < 0) None else view
          view = Some(MatView.update(base, df, Seq("lang"),
            Map("chars" -> length(col("text")))).localCheckpoint())
      }
    }
    val got = view.get.collect()
      .map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("n"), r.getAs[Long]("chars"))).toMap
    val direct = table.pages().groupBy(col("lang"))
      .agg(count(org.apache.spark.sql.functions.lit(1)).as("n"),
        sum(length(col("text")).cast("long")).as("chars"))
      .collect()
      .map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("n"), r.getAs[Long]("chars"))).toMap
    assert(got == direct)
  }

  test("MatView: a key whose live count reaches zero leaves the view") {
    import org.apache.spark.sql.functions.{col, length}
    import spark.implicits._
    val ins = Seq(("insert", "u1", "aaa", "en"), ("insert", "u2", "bb", "de"))
      .toDF("change_type", "url", "text", "lang")
    val v1 = MatView.update(None, ins, Seq("lang"), Map("chars" -> length(col("text"))))
    assert(v1.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet ==
      Set(("en", 1L, 3L), ("de", 1L, 2L)))
    // update moves u1's chars; delete removes de entirely (count hits 0)
    val d2 = Seq(
      ("update_preimage", "u1", "aaa", "en"), ("update_postimage", "u1", "aaaaa", "en"),
      ("delete", "u2", "bb", "de")).toDF("change_type", "url", "text", "lang")
    val v2 = MatView.update(Some(v1), d2, Seq("lang"), Map("chars" -> length(col("text"))))
    assert(v2.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet ==
      Set(("en", 1L, 5L)))
  }

  test("MatView: NULL keys fold into one group; NULL sums count as zero; plain updates rejected") {
    import org.apache.spark.sql.functions.{col, length}
    val ins = Seq(("insert", "u1", "aa", null: String), ("insert", "u2", null: String, null: String))
      .toDF("change_type", "url", "text", "lang")
    val v1 = MatView.update(None, ins, Seq("lang"), Map("chars" -> length(col("text"))))
      .localCheckpoint()
    // one NULL-key group (not two), null text contributed 0 chars
    assert(v1.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((null, 2L, 2L)))
    // a second delivery must MERGE into the NULL-key row (null-safe join),
    // and a delete retracts from it
    val d2 = Seq(("insert", "u3", "bbb", null: String), ("delete", "u2", null: String, null: String))
      .toDF("change_type", "url", "text", "lang")
    val v2 = MatView.update(Some(v1), d2, Seq("lang"), Map("chars" -> length(col("text"))))
    assert(v2.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((null, 2L, 5L)))
    // plain (non-preimage) changelog rows have no sign — fail fast, not drift
    val plain = Seq(("update", "u1", "cc", null: String))
      .toDF("change_type", "url", "text", "lang")
    val ex = intercept[Exception](
      MatView.update(Some(v1), plain, Seq("lang"),
        Map("chars" -> length(col("text")))).collect())
    assert(ex.getMessage.contains("preimage") ||
      Option(ex.getCause).exists(_.getMessage.contains("preimage")))
  }

  test("followChanges: pinTag exempts the cursor from retention; lagging follower survives") {
    val table = new LakeTable(spark, tmpDir())
    val groups = segGroups(allEvents, 6)
    groups.take(2).zipWithIndex.foreach { case (g, i) =>
      CdcApply.applyBatch(table, spark.createDataset(g).toDF(), "fp", i.toLong,
        createBuckets = 8)
    }
    var cursor = 0L
    var sawBootstrap = false
    var downstream = Map.empty[String, String]
    def consume(): Unit =
      cursor = CdcStream.followChanges(table, cursor, pinTag = Some("follower-a")) {
        (df, from, to) =>
          if (from < 0) sawBootstrap = true
          df.collect().foreach { r =>
            val url = r.getAs[String]("url")
            if (r.getAs[String]("change_type") == "delete") downstream -= url
            else downstream += url -> r.getAs[String]("text")
          }
      }
    consume() // pins the consumed head
    val pinned = cursor
    // follower lags: 4 more commits + maintenance that would expire v(pinned)
    groups.drop(2).zipWithIndex.foreach { case (g, i) =>
      CdcApply.applyBatch(table, spark.createDataset(g).toDF(), "fp", (i + 2).toLong,
        createBuckets = 8)
    }
    table.expireSnapshots(keepLast = 1)
    assert(table.versionExists(pinned), "pinned cursor version must survive expiry")
    consume() // incremental diff, NOT a bootstrap
    assert(!sawBootstrap)
    assert(downstream == golden.map { case (u, (t, _, _, _)) => u -> t })
    assert(table.tags("follower-a") == cursor) // pin advanced with the cursor
  }

  test("followChanges: a consumer's own 'does not exist' failure propagates (no spurious bootstrap)") {
    val table = new LakeTable(spark, tmpDir())
    segGroups(allEvents, 6).take(2).zipWithIndex.foreach { case (g, i) =>
      CdcApply.applyBatchAppendRaw(table, spark.createDataset(g).toDF(), "q", i.toLong,
        createBuckets = 8)
    }
    var cursor = 0L
    cursor = CdcStream.followChanges(table, cursor) { (_, _, _) => () } // establish cursor
    CdcApply.applyBatchAppendRaw(table,
      spark.createDataset(segGroups(allEvents, 6)(2)).toDF(), "q", 2L, createBuckets = 8)
    // The changelog frame is lazy, so consumer-side failures surface inside
    // followChanges' try. A message merely CONTAINING "does not exist"
    // (Spark's phrasing for e.g. a missing sink path in the consumer's own
    // code) must NOT be misread as the cursor-expiry race while the cursor
    // version is still live - it must propagate, with no second (bootstrap)
    // delivery on top of the failed one.
    var deliveries = 0
    val e = intercept[RuntimeException] {
      CdcStream.followChanges(table, cursor) { (_, _, _) =>
        deliveries += 1
        throw new RuntimeException("Path /some/consumer/sink does not exist")
      }
    }
    assert(e.getMessage.contains("does not exist"))
    assert(deliveries == 1, "the consumer must not be re-invoked with a bootstrap")
    // the real race still degrades: cursor version actually gone -> bootstrap
    table.expireSnapshots(keepLast = 1)
    assert(!table.versionExists(cursor))
    var sawBootstrap = false
    CdcStream.followChanges(table, cursor) { (_, from, _) =>
      if (from < 0) sawBootstrap = true
    }
    assert(sawBootstrap, "an actually-expired cursor must degrade to the bootstrap")
  }

  test("followChanges: crash before cursor-persist re-polls the still-pinned old base") {
    val table = new LakeTable(spark, tmpDir())
    val groups = segGroups(allEvents, 6)
    groups.take(2).zipWithIndex.foreach { case (g, i) =>
      CdcApply.applyBatch(table, spark.createDataset(g).toDF(), "fc", i.toLong,
        createBuckets = 8)
    }
    var downstream = Map.empty[String, String]
    var sawBootstrap = false
    def consume(from: Long): Long =
      CdcStream.followChanges(table, from, pinTag = Some("follower-c")) {
        (df, f, _) =>
          if (f < 0) sawBootstrap = true
          df.collect().foreach { r =>
            val url = r.getAs[String]("url")
            if (r.getAs[String]("change_type") == "delete") downstream -= url
            else downstream += url -> r.getAs[String]("text")
          }
      }
    val acked = 0L // durable cursor: the consumer never persists the next one
    consume(acked) // delivery happens, then the consumer "crashes" —
    downstream = Map.empty // — losing its in-memory replica progress too
    // the world moves on: 4 more commits + retention that would collect the
    // old base were it not pinned under follower-c.prev
    groups.drop(2).zipWithIndex.foreach { case (g, i) =>
      CdcApply.applyBatch(table, spark.createDataset(g).toDF(), "fc", (i + 2).toLong,
        createBuckets = 8)
    }
    table.expireSnapshots(keepLast = 1)
    assert(table.versionExists(acked),
      "the last ACKED base must survive expiry (crash-window pin)")
    consume(acked) // restart from the durable cursor: incremental, correct
    assert(!sawBootstrap, "re-poll from the acked base must not bootstrap")
    assert(downstream == golden.map { case (u, (t, _, _, _)) => u -> t })
  }

  test("followChanges: expired unpinned cursor degrades to full-state re-bootstrap") {
    val table = new LakeTable(spark, tmpDir())
    val groups = segGroups(allEvents, 6)
    groups.take(2).zipWithIndex.foreach { case (g, i) =>
      CdcApply.applyBatch(table, spark.createDataset(g).toDF(), "fb", i.toLong,
        createBuckets = 8)
    }
    var cursor = 0L
    var downstream = Map.empty[String, String]
    def consume(): Int = {
      var bootstraps = 0
      cursor = CdcStream.followChanges(table, cursor) { (df, from, to) =>
        val rows = df.collect()
        if (from < 0) { // bootstrap: REPLACE the replica (inserts-only full state)
          bootstraps += 1
          assert(rows.forall(_.getAs[String]("change_type") == "insert"))
          downstream = rows.map(r =>
            r.getAs[String]("url") -> r.getAs[String]("text")).toMap
        } else rows.foreach { r =>
          val url = r.getAs[String]("url")
          if (r.getAs[String]("change_type") == "delete") downstream -= url
          else downstream += url -> r.getAs[String]("text")
        }
      }
      bootstraps
    }
    assert(consume() == 0) // normal incremental poll (v0 empty-creation base)
    val stale = cursor
    groups.drop(2).zipWithIndex.foreach { case (g, i) =>
      CdcApply.applyBatch(table, spark.createDataset(g).toDF(), "fb", (i + 2).toLong,
        createBuckets = 8)
    }
    table.expireSnapshots(keepLast = 1) // unpinned: the cursor version dies
    assert(!table.versionExists(stale))
    assert(consume() == 1) // degraded to bootstrap — and still reconverges
    assert(downstream == golden.map { case (u, (t, _, _, _)) => u -> t })
    assert(consume() == 0) // caught up: next poll is a no-op
  }

  test("tags: survive a crash between delete and rename of the tag file") {
    val table = new LakeTable(spark, tmpDir())
    segGroups(allEvents, 4).zipWithIndex.foreach { case (g, i) =>
      CdcApply.applyBatchAppendRaw(table, spark.createDataset(g).toDF(), "tc", i.toLong,
        createBuckets = 8)
    }
    table.tag("keep.v1", 1L)
    table.tag("keep.v2", 2L)
    // simulate the crash window: live file deleted, tmp of the NEXT state
    // still present (writeTags writes tmp first, then delete+rename)
    val root = new java.io.File(table.root)
    val live = new java.io.File(root, "tags.tsv")
    val tmp = new java.io.File(root, "tags.tsv.tmp-crashed")
    java.nio.file.Files.copy(live.toPath, tmp.toPath)
    assert(live.delete())
    assert(table.tags == Map("keep.v1" -> 1L, "keep.v2" -> 2L)) // recovered from tmp
    // expiry during the window still honors the pins
    table.expireSnapshots(keepLast = 1)
    assert(table.versionExists(1L) && table.versionExists(2L))
    // the next successful write heals the live file and sweeps the tmp
    val head = table.currentSnapshot.get.version
    table.tag("keep.head", head)
    assert(live.exists && !tmp.exists)
    assert(table.tags == Map("keep.v1" -> 1L, "keep.v2" -> 2L, "keep.head" -> head))
  }

  test("tags: pin versions, survive expireSnapshots, drop re-enables expiry") {
    val table = new LakeTable(spark, tmpDir())
    segGroups(allEvents, 8).zipWithIndex.foreach { case (g, i) =>
      CdcApply.applyBatchAppendRaw(table, spark.createDataset(g).toDF(), "t", i.toLong,
        createBuckets = 8)
    }
    val vMid = table.currentSnapshot.get.version / 2
    table.tag("train-cut.v1", vMid)
    assert(table.tags == Map("train-cut.v1" -> vMid))
    val midPages = pagesMap(table.pages(table.snapshotAtTag("train-cut.v1")))
    // compaction + expiry: the tagged mid snapshot must survive
    table.compact(maxFilesPerBucket = 1)
    val (expired1, _) = table.expireSnapshots(keepLast = 1)
    assert(expired1 > 0)
    assert(pagesMap(table.pages(table.snapshotAtTag("train-cut.v1"))) == midPages)
    assert(pagesMap(table.pages()) == golden) // head state intact
    // bad inputs fail loudly
    intercept[IllegalArgumentException](table.tag("no spaces", vMid))
    intercept[IllegalArgumentException](table.tag("ghost", 99999L))
    intercept[IllegalArgumentException](table.snapshotAtTag("missing"))
    // dropping the tag lets the next expiry collect the old snapshot
    table.dropTag("train-cut.v1")
    assert(table.tags.isEmpty)
    val (expired2, _) = table.expireSnapshots(keepLast = 1)
    assert(expired2 > 0)
    intercept[Exception](table.snapshotAt(vMid)) // version file gone
  }

  test("expireSnapshots sweeps crash orphans and unreferenced files") {
    val table = new LakeTable(spark, tmpDir())
    segGroups(allEvents, 8).zipWithIndex.foreach { case (g, i) =>
      CdcApply.applyBatchAppendRaw(table, spark.createDataset(g).toDF(), "q", i.toLong,
        createBuckets = 8)
    }
    // inject a crash orphan: a data dir written but never committed
    val root = table.root
    val orphanDir = new java.io.File(s"$root/data/orphan-commit/_bucket=0")
    orphanDir.mkdirs()
    val orphan = new java.io.File(orphanDir, "part-orphan.parquet")
    java.nio.file.Files.write(orphan.toPath, Array[Byte](1, 2, 3))
    // compact (rewrites everything) then expire to 1 snapshot
    table.compact(maxFilesPerBucket = 1)
    val (expired, deleted) = table.expireSnapshots(keepLast = 1)
    assert(expired > 0 && deleted > 0)
    assert(!orphan.exists, "crash orphan survived GC")
    // every remaining data file is referenced; state intact
    val snap = table.currentSnapshot.get
    val referenced = snap.files.map(f => new org.apache.hadoop.fs.Path(f.path).toUri.getPath).toSet
    val onDisk = {
      val b = scala.collection.mutable.ArrayBuffer.empty[String]
      def walk(f: java.io.File): Unit =
        if (f.isDirectory) f.listFiles().foreach(walk)
        else if (f.getName.endsWith(".parquet")) b += f.getAbsolutePath
      walk(new java.io.File(s"$root/data")); b.toSet
    }
    assert(onDisk == referenced, s"unreferenced files remain: ${onDisk -- referenced}")
    assert(pagesMap(table.pages()) == golden)
  }

  test("expireSnapshots never deletes un-flushed L0 spanning files of retained snapshots") {
    val table = new LakeTable(spark, tmpDir())
    val groups = segGroups(allEvents, 8).take(3)
    groups.zipWithIndex.foreach { case (g, i) =>
      CdcApply.applyBatchAppendRaw(table, spark.createDataset(g).toDF(), "e", i.toLong,
        createBuckets = 8, spanning = true)
    }
    val preFiles = table.currentSnapshot.get.files.map(_.path)
    assert(preFiles.nonEmpty && table.currentSnapshot.get.files.forall(_.bucket < 0),
      "precondition: all files are un-flushed L0 spanning files")
    val expectedPages = pagesMap(table.pages())
    // keepLast=1: the retained snapshot references L0 files from EVERY prior
    // commit dir — expiry must not touch any of them (the fixed-depth
    // getParent bug resolved L0 commit dirs to data/ and deleted them all)
    val (expired, deleted) = table.expireSnapshots(keepLast = 1)
    assert(expired > 0)
    assert(deleted == 0, s"expiry deleted $deleted referenced L0 files")
    assert(pagesMap(table.pages()) == expectedPages)
    // after the L0→bucket flush the old L0 commit dirs become unreferenced
    // and a second expiry collects them
    table.compact(maxFilesPerBucket = 1)
    val (_, deletedAfterFlush) = table.expireSnapshots(keepLast = 1)
    assert(deletedAfterFlush > 0, "flushed-away L0 files should be collected")
    assert(pagesMap(table.pages()) == expectedPages)
  }

  test("optimistic concurrency: a stale-base commit is refused, a re-read retry lands") {
    val root = tmpDir()
    val a = new LakeTable(spark, root)
    segGroups(allEvents, 8).take(2).zipWithIndex.foreach { case (g, i) =>
      CdcApply.applyBatchAppendRaw(a, spark.createDataset(g).toDF(), "w", i.toLong,
        createBuckets = 8)
    }
    // writer B reads its base, then A advances the table underneath it
    val b = new LakeTable(spark, root)
    val staleBase = b.currentSnapshot.get
    val advanced = a.commit(a.currentSnapshot.get.copy(
      props = a.currentSnapshot.get.props + ("touched_by" -> "a")))
    // B's commit from the stale base would silently drop A's changes — refused
    intercept[java.util.ConcurrentModificationException] {
      b.commit(staleBase.copy(props = staleBase.props + ("touched_by" -> "b")))
    }
    // the Iceberg retry loop: re-read, reapply the change, commit — lands,
    // with BOTH writers' effects preserved
    val fresh = b.currentSnapshot.get
    assert(fresh.version == advanced.version)
    val landed = b.commit(fresh.copy(props = fresh.props + ("touched_by_b" -> "b")))
    assert(landed.props.get("touched_by").contains("a"))
    assert(landed.props.get("touched_by_b").contains("b"))
    assert(pagesMap(a.pages(a.snapshotAt(landed.version))) ==
      pagesMap(b.pages(landed)))
  }
}
