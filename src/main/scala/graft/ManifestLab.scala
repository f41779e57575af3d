package graft

import org.apache.spark.sql.SparkSession

import graft.lake.{DataFile, LakeTable}

/** Manifest-scale stress: prove the driver-side metadata path at the file
  * counts a 100 TB table implies (10^5–10^6 data files), WITHOUT any data on
  * disk — `commit`/`snapshotAt`/`planFiles` never open data files, so a
  * synthetic file list exercises exactly the production code paths:
  *
  *   1. bulk-populating the manifest to N entries,
  *   2. snapshot load (read version JSON + fold the manifest-delta chain),
  *   3. point-lookup pruning (`planFiles` bucket + urlhash),
  *   4. steady-state small commit (O(batch) delta append + the in-memory
  *      file-list diff),
  *   5. the consolidation commit (the worst case: writes one full manifest,
  *      O(table) JSON), and
  *   6. driver-heap residency of the resolved file list.
  *
  * Usage: ManifestLab [nFiles] — prints one latency table; results recorded
  * in BASELINE.md. Dev/evidence tool only.
  */
object ManifestLab {

  private def rmrf(p: String): Unit =
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p))

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  private def usedMb(): Long = {
    val rt = Runtime.getRuntime
    System.gc(); System.gc()
    (rt.totalMemory() - rt.freeMemory()) / (1024 * 1024)
  }

  /** Synthetic but realistic entries: production-shaped paths, disjoint lsn
    * ranges per file, urlhash ranges striped across buckets.
    */
  private def synthFiles(root: String, from: Int, n: Int, buckets: Int): Seq[DataFile] =
    (from until from + n).map { i =>
      val b = i % buckets
      DataFile(
        path = f"$root/data/bucket=$b%04d/part-$i%08d-0000-c000.snappy.parquet",
        bucket = b, schemaId = 0, rows = 100000L, bytes = 128L * 1024 * 1024,
        minLsn = i.toLong * 100000, maxLsn = i.toLong * 100000 + 99999,
        minUrlHash = Long.MinValue + b.toLong * (Long.MaxValue / buckets * 2),
        maxUrlHash = Long.MinValue + (b + 1).toLong * (Long.MaxValue / buckets * 2) - 1)
    }

  def main(args: Array[String]): Unit = {
    val nFiles = if (args.nonEmpty) args(0).toInt else 1000000
    val scratch = sys.env.getOrElse("SPARK_GRAFT_SCRATCH", "/dev/shm/graft")
    val root = s"$scratch/manifest-lab"
    rmrf(root)
    val spark = SparkSession.builder().master("local[4]").appName("manifest-lab")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val buckets = 1024
      val table = new LakeTable(spark, root)
      var snap = table.create(graft.core.Schemas.page, buckets)
      val memBase = usedMb()

      // 1) bulk-populate: one big commit (the compaction/backfill shape)
      val bulk = synthFiles(root, 0, nFiles, buckets)
      val (s1, tBulk) = timed(table.commit(snap.copy(files = snap.files ++ bulk)))
      snap = s1
      println(f"[mlab] bulk commit of $nFiles%,d adds: $tBulk%.2f s")

      // 2) cold snapshot load through a FRESH handle (no cached snapshot):
      //    version JSON read + manifest chain fold
      val cold = new LakeTable(spark, root)
      val (loaded, tLoad) = timed(cold.snapshotAt(snap.version))
      require(loaded.files.size == nFiles, s"lost files: ${loaded.files.size}")
      println(f"[mlab] cold snapshot load ($nFiles%,d entries): $tLoad%.2f s")
      val memLoaded = usedMb()

      // 3) point-lookup prune: bucket + urlhash (the lookupUrl path)
      val probeHash = Long.MinValue + 17L * (Long.MaxValue / buckets * 2) + 42
      val (hits, tPlan) = timed(table.planFiles(loaded,
        buckets = Some(Set(17)), urlHash = Some(probeHash)))
      println(f"[mlab] planFiles point prune over $nFiles%,d: ${tPlan * 1000}%.1f ms " +
        f"(${hits.size} candidate files)")
      // lsn-watermark prune (the incremental-consumer path)
      val (inc, tPlanLsn) = timed(table.planFiles(loaded,
        lsnAtLeast = Some(nFiles.toLong * 100000 - 5)))
      println(f"[mlab] planFiles lsn prune: ${tPlanLsn * 1000}%.1f ms (${inc.size} files)")

      // 4) steady-state small commits: the unhinted path pays an O(table)
      //    in-memory file-list diff; the appendedOnly hint (what the
      //    streaming apply passes) is O(batch)
      val steady = (1 to 5).map { k =>
        val add = synthFiles(root, nFiles + k * 10, 10, buckets)
        val (s2, t) = timed(table.commit(snap.copy(files = snap.files ++ add)))
        snap = s2
        t
      }
      println(f"[mlab] steady small commit, unhinted diff (+10 files): " +
        f"median ${steady.sorted.apply(steady.size / 2) * 1000}%.0f ms " +
        f"(min ${steady.min * 1000}%.0f, max ${steady.max * 1000}%.0f)")
      val steadyHinted = (1 to 5).map { k =>
        val add = synthFiles(root, nFiles + 1000 + k * 10, 10, buckets)
        val (s2, t) = timed(table.commit(snap.copy(files = snap.files ++ add),
          appendedOnly = Some(add)))
        snap = s2
        t
      }
      println(f"[mlab] steady small commit, appendedOnly hint (+10 files): " +
        f"median ${steadyHinted.sorted.apply(steadyHinted.size / 2) * 1000}%.0f ms " +
        f"(min ${steadyHinted.min * 1000}%.0f, max ${steadyHinted.max * 1000}%.0f)")

      // 5) force the consolidation commit: pad the DELTA chain to the
      //    threshold — the next commit folds everything into bucket-range
      //    chunk manifests (content-addressed; first time = all dirty)
      def deltas(s: graft.lake.Snapshot): Int =
        s.manifests.count(n => !LakeTable.isChunkManifest(n))
      while (deltas(snap) + 1 < LakeTable.ManifestConsolidateEvery) {
        val add = synthFiles(root, 2 * nFiles + snap.manifests.size * 10, 10, buckets)
        snap = table.commit(snap.copy(files = snap.files ++ add))
      }
      val add = synthFiles(root, 3 * nFiles, 10, buckets)
      val (s3, tConsol) = timed(table.commit(snap.copy(files = snap.files ++ add)))
      snap = s3
      val chunks1 = snap.manifests.filter(LakeTable.isChunkManifest)
      require(chunks1.size == snap.manifests.size, s"expected all-chunk chain: ${snap.manifests}")
      println(f"[mlab] consolidation commit (cold: all ${chunks1.size} chunks dirty, " +
        f"${snap.files.size}%,d entries): $tConsol%.2f s")

      // 5b) steady-state consolidation with LOCALIZED churn (the L0/streaming
      //     shape): pad the chain with HINTED adds confined to ONE bucket —
      //     exactly what the streaming appenders commit — then consolidate;
      //     only that bucket's chunk should be rewritten, with O(dirty) CPU
      while (deltas(snap) + 1 < LakeTable.ManifestConsolidateEvery) {
        val i = 4 * nFiles + deltas(snap) * 10
        val one = synthFiles(root, i, 10, buckets).map(_.copy(bucket = 17))
        snap = table.commit(snap.copy(files = snap.files ++ one), appendedOnly = Some(one))
      }
      val one = synthFiles(root, 5 * nFiles, 10, buckets).map(_.copy(bucket = 17))
      val (s4, tConsolDirty) = timed(table.commit(snap.copy(files = snap.files ++ one),
        appendedOnly = Some(one)))
      snap = s4
      val chunks2 = snap.manifests.filter(LakeTable.isChunkManifest)
      val fresh = chunks2.toSet -- chunks1.toSet
      println(f"[mlab] consolidation commit (localized churn: ${fresh.size} of " +
        f"${chunks2.size} chunks rewritten): $tConsolDirty%.2f s")

      // 6) reload after consolidation (parse the chunk set)
      val cold2 = new LakeTable(spark, root)
      val (_, tLoad2) = timed(cold2.snapshotAt(snap.version))
      println(f"[mlab] cold full load after consolidation: $tLoad2%.2f s")

      // 6b) chunked cold point prune: fresh handle, NO full manifest fold —
      //     reads the snapshot header + 1 bucket chunk + the L0 chunk
      val cold3 = new LakeTable(spark, root)
      val (hitsC, tPruneC) = timed(cold3.planFilesChunked(snap.version,
        Set(17), urlHash = Some(probeHash)))
      println(f"[mlab] COLD chunked point prune (header + touched chunks only): " +
        f"${tPruneC * 1000}%.0f ms (${hitsC.size} candidate files)")
      val full = cold2.planFiles(snap, buckets = Some(Set(17)), urlHash = Some(probeHash))
      require(hitsC.toSet == full.toSet, "chunked prune diverged from full prune")

      println(f"[mlab] driver heap: base $memBase%,d MB, with resolved list " +
        f"$memLoaded%,d MB (delta ${memLoaded - memBase}%,d MB)")
      println(f"[mlab] == $nFiles%,d files: load=$tLoad%.2f/$tLoad2%.2f s, " +
        f"prune=${tPlan * 1000}%.0f ms warm / ${tPruneC * 1000}%.0f ms cold-chunked, " +
        f"steady commit=" +
        f"${steady.sorted.apply(steady.size / 2) * 1000}%.0f ms unhinted / " +
        f"${steadyHinted.sorted.apply(steadyHinted.size / 2) * 1000}%.0f ms hinted, " +
        f"consolidation=$tConsol%.2f s cold / $tConsolDirty%.2f s localized ==")
    } finally { spark.stop(); rmrf(root) }
  }
}
