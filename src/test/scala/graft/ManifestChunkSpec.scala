package graft

import graft.lake.{DataFile, LakeTable}

/** Two-level (chunked, content-addressed) manifest consolidation:
  * correctness of the fold, clean-chunk reuse, the removed-file
  * resurrection guard, the lazy chunked point-prune path, and GC of
  * superseded chunk files. Runs with a low consolidation threshold via
  * `-Dgraft.manifestConsolidateEvery` (per-suite JVM, set in-process).
  */
class ManifestChunkSpec extends SparkSpec {

  private val Threshold = 4

  override def beforeAll(): Unit = {
    sys.props("graft.manifestConsolidateEvery") = Threshold.toString
    sys.props("graft.manifestChunks") = "8" // small tables would collapse to 1
    super.beforeAll()
  }
  override def afterAll(): Unit = {
    try {
      sys.props.remove("graft.manifestConsolidateEvery")
      sys.props.remove("graft.manifestChunks")
      ()
    } finally super.afterAll()
  }

  private def df(root: String, i: Int, bucket: Int): DataFile =
    DataFile(s"$root/data/c/part-$i.parquet", bucket, 0, 100L, 1000L,
      i.toLong * 10, i.toLong * 10 + 9, bucket.toLong * 1000, bucket.toLong * 1000 + 999)

  private def create(root: String): LakeTable = {
    val t = new LakeTable(spark, root)
    t.create(graft.core.Schemas.page, 64)
    t
  }

  test("consolidation folds to chunk manifests; snapshotAt equals the expected set") {
    val root = tmpDir()
    val t = create(root)
    var snap = t.currentSnapshot.get
    val expected = scala.collection.mutable.Map.empty[String, DataFile]
    (0 until 10).foreach { k =>
      val adds = Seq(df(root, k * 2, k % 5), df(root, k * 2 + 1, (k + 3) % 5))
      adds.foreach(f => expected(f.path) = f)
      snap = t.commit(snap.copy(files = snap.files ++ adds))
    }
    assert(snap.manifests.exists(LakeTable.isChunkManifest), "threshold must have consolidated")
    val reread = new LakeTable(spark, root).snapshotAt(snap.version)
    assert(reread.files.map(f => f.path -> f).toMap == expected.toMap)
  }

  /** Commit single-file adds in `bucket` until the manifest list is JUST
    * consolidated (all chunks, no trailing deltas) — the clean state the
    * reuse assertions need. Terminates within one threshold cycle.
    */
  private def padUntilConsolidated(t: LakeTable, bucket: Int, idFrom: Int): Unit = {
    var snap = t.currentSnapshot.get
    var k = idFrom
    // do-while: at least one commit, so a call from an already-clean state
    // still churns `bucket` and reaches the NEXT consolidation
    while ({
      snap = t.commit(snap.copy(files = snap.files :+ df(t.root, k, bucket)))
      k += 1
      snap.manifests.isEmpty ||
        snap.manifests.exists(n => !LakeTable.isChunkManifest(n))
    }) ()
  }

  test("a file removed after landing in a chunk cannot resurrect at the next consolidation") {
    val root = tmpDir()
    val t = create(root)
    var snap = t.currentSnapshot.get
    val victim = df(root, 999, 2)
    snap = t.commit(snap.copy(files = snap.files :+ victim))
    padUntilConsolidated(t, bucket = 1, idFrom = 0) // victim now lives in a chunk
    snap = t.currentSnapshot.get
    val chunks1 = snap.manifests.filter(LakeTable.isChunkManifest)
    assert(chunks1.nonEmpty && snap.files.exists(_.path == victim.path))
    // remove the victim (compaction-like), then force consolidation #2: the
    // victim's chunk content changed → new hash → rewritten without it
    snap = t.commit(snap.copy(files = snap.files.filterNot(_.path == victim.path)))
    padUntilConsolidated(t, bucket = 1, idFrom = 100)
    snap = t.currentSnapshot.get
    val chunks2 = snap.manifests.filter(LakeTable.isChunkManifest)
    assert(chunks2.toSet != chunks1.toSet, "second consolidation must have run")
    val reread = new LakeTable(spark, root).snapshotAt(snap.version)
    assert(!reread.files.exists(_.path == victim.path), "removed file resurrected")
    assert(!t.planFilesChunked(snap.version, Set(2)).exists(_.path == victim.path))
  }

  test("clean chunks are reused by name; only touched chunks are rewritten") {
    val root = tmpDir()
    val t = create(root)
    var snap = t.currentSnapshot.get
    // seed files across many buckets, then reach a clean consolidated state
    val seed = (0 until 64).map(b => df(root, b, b))
    snap = t.commit(snap.copy(files = snap.files ++ seed))
    padUntilConsolidated(t, bucket = 1, idFrom = 1000)
    val chunks1 = t.currentSnapshot.get.manifests.filter(LakeTable.isChunkManifest)
    assert(chunks1.size > 1)
    // churn ONE bucket (63 → the last chunk) until the next consolidation
    padUntilConsolidated(t, bucket = 63, idFrom = 2000)
    val chunks2 = t.currentSnapshot.get.manifests.filter(LakeTable.isChunkManifest)
    val freshOnes = chunks2.toSet -- chunks1.toSet
    assert(freshOnes.size == 1, s"expected 1 rewritten chunk, got $freshOnes")
    assert((chunks1.toSet intersect chunks2.toSet).nonEmpty, "clean chunks must be reused")
  }

  test("chunked point prune equals the full-fold prune, incl. L0 files and trailing deltas") {
    val root = tmpDir()
    val t = create(root)
    var snap = t.currentSnapshot.get
    val seed = (0 until 32).map(b => df(root, b, b)) :+ df(root, 777, -1) // an L0 spanning file
    snap = t.commit(snap.copy(files = snap.files ++ seed))
    (0 until Threshold).foreach { k =>
      snap = t.commit(snap.copy(files = snap.files :+ df(root, 100 + k, k)))
    }
    // trailing deltas after consolidation: an add in bucket 5 and a remove in bucket 3
    snap = t.commit(snap.copy(files = snap.files :+ df(root, 200, 5)))
    snap = t.commit(snap.copy(files = snap.files.filterNot(_.bucket == 3)))
    val full = t.snapshotAt(snap.version)
    for (b <- Seq(0, 3, 5, 31)) {
      val lazyFiles = t.planFilesChunked(snap.version, Set(b)).toSet
      val fullFiles = t.planFiles(full, buckets = Some(Set(b))).toSet
      assert(lazyFiles == fullFiles, s"bucket $b: $lazyFiles vs $fullFiles")
    }
  }

  test("superseded chunk files are GC'd once unreferenced; live ones survive expiry") {
    val root = tmpDir()
    val t = create(root)
    var snap = t.currentSnapshot.get
    val seed = (0 until 16).map(b => df(root, b, b))
    snap = t.commit(snap.copy(files = snap.files ++ seed))
    (0 until Threshold).foreach { k =>
      snap = t.commit(snap.copy(files = snap.files :+ df(root, 100 + k, k)))
    }
    val chunks1 = snap.manifests.filter(LakeTable.isChunkManifest)
    // churn everything — remove+re-add every file under a NEW path (the
    // compaction shape; DataFile entries are path-immutable, in-place stat
    // mutation is not a real commit) → next consolidation rewrites all chunks
    (0 to Threshold).foreach { k =>
      snap = t.commit(snap.copy(files = snap.files.map(f =>
        f.copy(path = f.path + s".r$k")) :+ df(root, 300 + k, k)))
    }
    val chunks2 = snap.manifests.filter(LakeTable.isChunkManifest)
    assert((chunks1.toSet intersect chunks2.toSet).isEmpty)
    t.expireSnapshots(keepLast = 1)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sessionState.newHadoopConf())
    chunks1.foreach { n =>
      assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$root/manifests/$n")),
        s"superseded chunk $n not swept")
    }
    chunks2.foreach { n =>
      assert(fs.exists(new org.apache.hadoop.fs.Path(s"$root/manifests/$n")),
        s"live chunk $n swept")
    }
    assert(new LakeTable(spark, root).snapshotAt(snap.version).files.size == snap.files.size)
  }
}
