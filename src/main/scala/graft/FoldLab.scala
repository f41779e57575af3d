package graft

import org.apache.spark.sql.SparkSession

import graft.cdc.CdcApply
import graft.gen.{ChangeGen, GenConfig}
import graft.lake.LakeTable

/** Compaction-fold A/B harness: ingest one L0 replay ONCE, then time the
  * L0→bucket fold (LWW resolve + bucketed write, the 10^10-event steady-state
  * ceiling) repeatedly over the same immutable L0 file set, alternating the
  * sorted single-exchange fold against the wide `max_by` fold. Isolates the
  * fold from ingest/JVM/page-cache variance that polluted whole-run A/Bs.
  * Dev tool only — the official artifact stays graft.Bench.
  *
  * Usage: FoldLab <events> <pairs> [cores]
  */
object FoldLab {
  def main(args: Array[String]): Unit = {
    val nEvents = args(0).toLong
    val pairs = args(1).toInt
    val cores = if (args.length > 2) args(2).toInt else 16
    val scratch = sys.env.getOrElse("SPARK_GRAFT_SCRATCH", "/dev/shm/graft")
    new java.io.File(scratch).mkdirs()

    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("fold-lab")
      .config("spark.sql.shuffle.partitions", (cores * 2).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", s"$scratch/spark-local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val walDir = s"$scratch/probe-wal-$nEvents"
    if (!new java.io.File(walDir).exists())
      ChangeGen.writeWal(spark, GenConfig(events = nEvents, segmentSize = nEvents / 96), walDir)

    val work = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(scratch), "foldlab").toString
    try {
      val table = new LakeTable(spark, s"$work/lake")
      val wal = spark.read.parquet(walDir)
      CdcApply.applyBatchAppendRaw(table, wal, "lab", 0L, createBuckets = 64, spanning = true)
      val snap = table.currentSnapshot.get
      val schema = table.currentFileSchema(snap)
      val inRows = snap.files.map(_.rows).sum
      println(s"[foldlab] L0 set: ${snap.files.size} files, $inRows rows")

      def trial(mode: String): Double = {
        val raw = table.readFiles(snap, snap.files, schema)
        val t0 = System.nanoTime()
        val files = mode match {
          case "sorted" =>
            table.writeDataFilesSortedFold(raw, snap.currentSchemaId, snap.buckets,
              nTasks = math.min(snap.buckets, cores * 2), maxRecordsPerFile = 4L * 1024 * 1024,
              bloomUrl = true)
          case "maxby" =>
            table.writeDataFiles(table.resolve(raw), snap.currentSchemaId, snap.buckets,
              nTasks = math.min(snap.buckets, cores * 2), maxRecordsPerFile = 4L * 1024 * 1024,
              bloomUrl = true)
        }
        val secs = (System.nanoTime() - t0) / 1e9
        val outRows = files.map(_.rows).sum
        files.map(f => new java.io.File(new java.net.URI(
          if (f.path.startsWith("file:")) f.path else "file://" + f.path).getPath))
          .map(_.getParentFile.getParentFile).distinct
          .foreach(d => org.apache.commons.io.FileUtils.deleteQuietly(d))
        println(f"[foldlab] $mode%6s: $secs%6.1f s  ${inRows / secs}%8.0f ev/s  out=$outRows")
        secs
      }

      trial("maxby"); trial("sorted") // JIT warmup
      val results = (1 to pairs).flatMap(_ => Seq("maxby" -> trial("maxby"),
        "sorted" -> trial("sorted")))
      for ((m, ts) <- results.groupBy(_._1).view.mapValues(_.map(_._2).sorted)) {
        val med = ts.toSeq((ts.size - 1) / 2)
        println(f"[foldlab] == $m%6s best=${ts.min}%.1f s med=$med%.1f s " +
          f"(${inRows / ts.min}%.0f / ${inRows / med}%.0f ev/s) ==")
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))
      spark.stop()
    }
  }
}
