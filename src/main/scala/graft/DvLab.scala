package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.cdc.CdcStream
import graft.gen.{ChangeGen, GenConfig}
import graft.lake.LakeTable

/** Write-amplification / read-latency comparison across merge modes (the
  * evidence table behind retiring COW in favor of deletion vectors):
  * replay one shared WAL through `cow`, `mor`, and `dv`, then report
  *
  *  - apply throughput (ev/s over the whole replay)
  *  - '''write amplification''': total bytes landed under `data/` during the
  *    replay (no expiry runs, so every intermediate file persists = the
  *    cumulative write volume) divided by the bytes of ONE fully-compacted
  *    copy of the final state
  *  - '''read latency''': a full-scan aggregate over `pages()` (the
  *    read-optimization question COW existed to answer) and a point lookup,
  *    both best-of-3
  *
  * Dev tool; the official artifact stays graft.Bench. Usage:
  * `DvLab <events> [modes]`.
  */
object DvLab {

  private val scratch = sys.env.getOrElse("SPARK_GRAFT_SCRATCH", "/dev/shm/graft")
  private def rmrf(p: String): Unit =
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p))

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("dv-lab")
      .config("spark.sql.shuffle.partitions", (cores * 2).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.openCostInBytes", "134217728")
      .config("spark.local.dir", s"$scratch/spark-local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def duBytes(dir: String): Long = {
    val root = new java.io.File(dir)
    if (!root.exists()) 0L
    else {
      var total = 0L
      val stack = scala.collection.mutable.Stack(root)
      while (stack.nonEmpty) {
        val f = stack.pop()
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(stack.push))
        else total += f.length()
      }
      total
    }
  }

  def main(args: Array[String]): Unit = {
    val nEvents = if (args.nonEmpty) args(0).toLong else 2000000L
    // "dv-ac" = dv with auto-compaction (threshold 4 files/bucket): the
    // production shape — masks fold into the data periodically, so reads
    // converge back to the compacted-layout latency COW pays 4.5x write-amp
    // for on every batch
    val modes = if (args.length > 1) args(1).split(",").toSeq
      else Seq("cow", "mor", "dv", "dv-ac")
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    new java.io.File(scratch).mkdirs()

    val wal = s"$scratch/dvlab-wal-$nEvents"
    locally {
      val gen = session(cores)
      try {
        if (!new java.io.File(wal).exists())
          ChangeGen.writeWal(gen, GenConfig(events = nEvents, segmentSize = nEvents / 96), wal)
      } finally gen.stop()
    }

    for (mode <- modes) {
      val spark = session(cores)
      try {
        val work = s"$scratch/dvlab-$mode"
        rmrf(work)
        val table = new LakeTable(spark, s"$work/lake")
        var events = 0L
        val t0 = System.nanoTime()
        // IDENTICAL trigger size for every mode: a per-mode batch size would
        // confound the strategy comparison with per-batch fixed costs (the
        // whole point is write-amp/read-latency at the SAME batch cadence)
        CdcStream.start(spark, wal, table, s"$work/ckpt",
          maxFilesPerTrigger = 12,
          createBuckets = 64, mode = mode.stripSuffix("-ac"),
          autoCompactFilesPerBucket = if (mode.endsWith("-ac")) 4 else 0,
          onBatch = st => events += st.events)
          .awaitTermination()
        val applySecs = (System.nanoTime() - t0) / 1e9
        val written = duBytes(s"$work/lake/data")

        // one fully-compacted copy of the final state = the logical size
        val refDir = s"$scratch/dvlab-$mode-ref"
        rmrf(refDir)
        table.pages().write.parquet(refDir)
        val logical = duBytes(refDir)
        rmrf(refDir)

        def best3(body: => Unit): Double =
          (1 to 3).map { _ =>
            val t = System.nanoTime(); body; (System.nanoTime() - t) / 1e9
          }.min
        val snap = table.currentSnapshot.get
        val scanSecs = best3 {
          table.pages(snap).agg(count(lit(1)), sum(length(col("text")))).collect()
        }
        val url = table.pages(snap).select("url").head().getString(0)
        val pointSecs = best3 { table.lookupUrl(snap, url).collect() }

        println(f"[dvlab] $mode%-4s apply=${events / applySecs}%9.0f ev/s (${applySecs}%6.1f s)  " +
          f"written=${written / 1e9}%7.2f GB  logical=${logical / 1e9}%6.2f GB  " +
          f"write-amp=${written.toDouble / math.max(1, logical)}%5.2fx  " +
          f"scan=${scanSecs}%6.2f s  point=${pointSecs}%5.2f s  " +
          f"files=${snap.files.size}%d dv=${snap.dvFiles.map(_.rows).sum}%d")
        rmrf(work)
      } finally spark.stop()
    }
  }
}
