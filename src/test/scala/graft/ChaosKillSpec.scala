package graft

import scala.jdk.CollectionConverters._

import graft.lake.LakeTable

/** Real `kill -9` chaos for the commit protocol: spawn [[ChaosChild]] JVMs
  * running a hot commit/stage/publish loop against one lake root, SIGKILL
  * each at a seeded random offset after readiness, respawn, and finally let
  * one run to completion. Asserts the crash-recovery invariants the
  * in-process injection specs (ConcurrencySpec/WapSpec) can only simulate:
  *
  *  - '''exactly-once''': the durable lineage log holds every batch 0..N
  *    exactly ONCE — no batch lost (the progress file is a lower bound on
  *    what must survive) and none double-committed through any stage/publish
  *    replay window;
  *  - '''chain integrity''': the head snapshot folds cleanly from disk in a
  *    fresh handle, with the expected file count;
  *  - '''no adopted debris''': no stage left pending, and maintenance
  *    (expireSnapshots) runs clean over whatever tmp debris the kills left.
  */
class ChaosKillSpec extends SparkSpec {

  private def javaBin: String =
    s"${System.getProperty("java.home")}/bin/java"

  private def addOpens: Seq[String] = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar"
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  private def spawn(root: String, target: Long, ready: java.io.File,
      progress: java.io.File, log: java.io.File): Process = {
    val cmd = (Seq(javaBin, "-Xmx1g", "-XX:+UseSerialGC") ++ addOpens ++ Seq(
      "-Dspark.ui.enabled=false",
      "-cp", System.getProperty("java.class.path"),
      "graft.ChaosChild", root, target.toString,
      ready.getAbsolutePath, progress.getAbsolutePath)).asJava
    new ProcessBuilder(cmd)
      .redirectOutput(log).redirectErrorStream(true).start()
  }

  test("kill -9 at random protocol offsets: exactly-once lineage, clean chain, no pending stages") {
    val work = tmpDir("chaos")
    val root = s"$work/lake"
    val progress = new java.io.File(s"$work/progress.txt")
    val log = new java.io.File(s"$work/child.log")
    val rnd = new scala.util.Random(20260821L)
    val target = 400L
    val kills = 6

    var lastSurvivor = 0L
    (1 to kills).foreach { cycle =>
      val ready = new java.io.File(s"$work/ready-$cycle")
      val p = spawn(root, target, ready, progress, log)
      // wait for the child's Spark init, then kill INSIDE the hot loop
      val deadline = System.currentTimeMillis() + 120000
      while (!ready.exists() && p.isAlive && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(ready.exists(), s"cycle $cycle: child never became ready (see $log)")
      Thread.sleep(100 + rnd.nextInt(900))
      p.destroyForcibly() // SIGKILL
      p.waitFor()
      // progress must never regress across kills
      val committed =
        if (progress.exists())
          scala.io.Source.fromFile(progress).getLines().filter(_.nonEmpty).map(_.toLong).toSeq
        else Seq.empty[Long]
      val hi = committed.maxOption.getOrElse(-1L)
      assert(hi >= lastSurvivor, s"cycle $cycle: progress went backwards ($hi < $lastSurvivor)")
      lastSurvivor = hi
    }
    assert(lastSurvivor >= 0, "no batch ever committed across the kill cycles — kills landed too early")

    // final clean run to completion
    val ready = new java.io.File(s"$work/ready-final")
    val p = spawn(root, target, ready, progress, log)
    assert(p.waitFor(10, java.util.concurrent.TimeUnit.MINUTES), "final child run timed out")
    assert(p.exitValue() == 0, s"final child run failed (see $log)")

    val table = new LakeTable(spark, root)
    val snap = table.snapshotAt(table.headVersion.get) // fresh fold from disk
    // exactly-once, on the record that is ATOMIC with the commit (the
    // snapshot's own lineage tail rides inside the claimed version JSON):
    // every batch 0..target exactly once
    val perBatch = snap.lineage.filter(_.queryId == "chaos")
      .groupBy(_.batchId).view.mapValues(_.size).toMap
    val missing = (0L to target).filterNot(perBatch.contains)
    val dups = perBatch.filter(_._2 > 1)
    assert(missing.isEmpty, s"batches lost across kills: ${missing.take(10)}")
    assert(dups.isEmpty, s"batches double-committed across kills: ${dups.take(10)}")
    // the convenience log (appended AFTER the claim — a kill in that window
    // may omit an entry, never duplicate or invent one): no dups, no phantoms
    val logged = table.lineageLog.filter(_.queryId == "chaos")
    assert(logged.groupBy(_.batchId).forall(_._2.size == 1),
      "duplicate entries in the lineage log")
    assert(logged.map(_.batchId).toSet.subsetOf(perBatch.keySet),
      "lineage log invented a batch no snapshot committed")
    assert(snap.watermarks("chaos") == target)
    assert(snap.files.size == 3 * (target + 1), s"file count ${snap.files.size}")
    // no stage survived (all were published by recovery or completion)
    assert(table.stagedIds.isEmpty, s"pending stages left: ${table.stagedIds}")
    // maintenance runs clean over the kill debris, and the table still reads
    table.expireSnapshots(keepLast = 2)
    assert(new LakeTable(spark, root).snapshotAt(table.headVersion.get)
      .files.size == 3 * (target + 1))
  }
}
