package graft

import org.apache.spark.sql.SparkSession

import graft.lake.{DataFile, LakeTable, LineageEntry}

/** Child process for the kill -9 chaos test ([[ChaosKillSpec]]): a hot
  * commit/stage/publish loop against a shared lake root, with a durable
  * progress file appended AFTER each successful commit. The parent SIGKILLs
  * this JVM at random offsets; on respawn the loop RESUMES from the table's
  * own watermark (not the progress file — the table is the source of truth,
  * the progress file is the parent's lower bound on what must survive).
  *
  * Batch pattern: every 3rd batch goes through the write-audit-publish
  * staged path (stage → publish), the rest are plain appendedOnly commits —
  * so kills land inside every commit-protocol window there is: delta write,
  * version-claim rename, consolidation chunk writes, stage write, publish
  * commit, staged-file delete.
  */
object ChaosChild {
  def main(args: Array[String]): Unit = {
    val root = args(0)
    val target = args(1).toLong
    val readyFile = new java.io.File(args(2))
    val progressFile = new java.io.File(args(3))

    val spark = SparkSession.builder().master("local[1]").appName("chaos-child")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val table = new LakeTable(spark, root)

    if (!table.exists) table.create(graft.core.Schemas.page, 8)

    // recovery rule: a pending stage from a previous life is either an
    // unpublished batch (publish it — the stage is durable, its batch id is
    // next in line) or the publish-crash window (publishStaged is the
    // idempotent cleanup)
    table.stagedIds.foreach(id => table.publishStaged(id))

    java.nio.file.Files.writeString(readyFile.toPath, "ready")

    var b = table.currentSnapshot.get.watermarks.getOrElse("chaos", -1L) + 1
    while (b <= target) {
      val snap = table.currentSnapshot.get
      val files = (0 until 3).map(i => DataFile(
        f"$root/data/b$b%06d/f$i.parquet", (b % 8).toInt, 0,
        10L, 100L, b * 10, b * 10 + 9, 0L, 999L))
      val next = snap.copy(
        files = snap.files ++ files,
        watermarks = snap.watermarks + ("chaos" -> b),
        lineage = snap.lineage :+ LineageEntry("chaos", b, 3, 3, 0, b * 10, b * 10 + 9, -1))
      if (b % 3 == 2) {
        val id = s"chaos-$b"
        table.stageCommit(next, id)
        table.publishStaged(id)
      } else {
        table.commit(next, appendedOnly = Some(files))
      }
      // durable AFTER the commit: everything in this file must be in the table
      val out = new java.io.FileOutputStream(progressFile, true)
      try {
        out.write(s"$b\n".getBytes("UTF-8"))
        out.getFD.sync()
      } finally out.close()
      b += 1
    }
    spark.stop()
    sys.exit(0)
  }
}
