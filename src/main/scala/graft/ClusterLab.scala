package graft

import org.apache.spark.sql.SparkSession

import graft.cdc.CdcStream
import graft.gen.{ChangeGen, GenConfig}
import graft.lake.LakeTable

/** Cross-JVM scaling evidence: the same L0 replay as [[ScalingLab]], but on
  * Spark's `local-cluster[workers, coresPerWorker, memMB]` master — a real
  * standalone cluster on one box, with executors as SEPARATE JVM processes
  * (own heaps, own GC, shuffle over the block-transfer service) instead of
  * threads sharing one JVM. This is the closest the sandbox gets to the
  * BASELINE.json "N to 4N executors" criterion: 1 executor JVM × C cores vs
  * 4 executor JVMs × C cores. The machine's memory bus stays shared — the
  * same dd-stream ceiling BASELINE.md calibrates — but shared-heap/GC
  * effects are gone, separating the two explanations.
  *
  * Usage: ClusterLab <events> <pairs> [coresPerWorker] [workersLo,workersHi]
  * Dev/evidence tool only — the official artifact stays graft.Bench.
  */
object ClusterLab {

  private val scratch = sys.env.getOrElse("SPARK_GRAFT_SCRATCH", "/dev/shm/graft")

  private def rmrf(p: String): Unit =
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p))

  private def session(workers: Int, coresPerWorker: Int, memMb: Int): SparkSession = {
    // executors are forked JVMs: they need the sbt classpath (spark jars +
    // target/classes) explicitly — nothing is inherited from the driver
    val cp = sys.props("java.class.path")
    val s = SparkSession.builder()
      .master(s"local-cluster[$workers,$coresPerWorker,$memMb]")
      .appName(s"cluster-lab-$workers-x-$coresPerWorker")
      .config("spark.executor.memory", s"${memMb}m")
      .config("spark.executor.extraClassPath", cp)
      .config("spark.executor.extraJavaOptions",
        // the same JDK17 opens build.sbt gives the driver JVM, plus GC
        // thread caps: several executor JVMs × default GC threads would
        // oversubscribe the 32-vCPU box (the BASELINE.md GC-thread finding)
        Seq("java.base/java.lang", "java.base/java.lang.invoke",
          "java.base/java.lang.reflect", "java.base/java.io",
          "java.base/java.net", "java.base/java.nio",
          "java.base/java.util", "java.base/java.util.concurrent",
          "java.base/java.util.concurrent.atomic",
          "java.base/sun.nio.ch", "java.base/sun.nio.cs",
          "java.base/sun.security.action", "java.base/sun.util.calendar")
          .map(p => s"--add-opens=$p=ALL-UNNAMED")
          .mkString(" ") + " -XX:ParallelGCThreads=4 -XX:ConcGCThreads=1" +
          // the round-2 BASELINE.md heap finding applies to executor JVMs
          // too: without THP, first-touch of a multi-GB heap is millions of
          // 4k page faults on this VM, paid during the timed window
          " -XX:+UseTransparentHugePages")
      .config("spark.sql.shuffle.partitions", (workers * coresPerWorker * 2).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "128m")
      .config("spark.sql.files.openCostInBytes", "134217728")
      .config("spark.local.dir", s"$scratch/spark-local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** One L0 replay in a fresh cluster; returns (events, secs). The cluster's
    * executor JVMs are forked per run, so JIT/codegen warmup must happen
    * INSIDE the session (an untimed warm-WAL replay on the same executors) —
    * cross-run warmup like [[ScalingLab]]'s would warm JVMs that are then
    * thrown away. Timing covers only the main replay, matching the in-JVM
    * protocol (session spin-up and warmup excluded; sustained apply is the
    * criterion).
    */
  private def oneRun(workers: Int, coresPerWorker: Int, memMb: Int,
      walDir: String): (Long, Double) = {
    val spark = session(workers, coresPerWorker, memMb)
    try {
      // wait until every executor has registered — otherwise the first
      // batches run under-parallel and the timing measures ramp-up
      val want = workers
      val deadline = System.nanoTime() + 120e9.toLong
      while (spark.sparkContext.statusTracker.getExecutorInfos.length - 1 < want &&
        System.nanoTime() < deadline) Thread.sleep(200)
      val work = s"$scratch/clab-$workers-$coresPerWorker"
      sys.props("graft.tasksPerSlot") = "1"
      rmrf(work)
      // warm with a FULL pass of the main WAL: with few executors a small
      // warm WAL gives each forked JVM only ~1 task — not enough for C2 to
      // compile the hot loops, and the timed run then eats multi-second
      // JIT-storm stragglers (measured: taskMax 18 s vs 4.6 s warm)
      val warmTable = new LakeTable(spark, s"$work/warmlake")
      CdcStream.start(spark, walDir, warmTable, s"$work/warmckpt",
        maxFilesPerTrigger = 96, createBuckets = 64, mode = "l0",
        onBatch = _ => ()).awaitTermination()
      rmrf(s"$work/warmlake"); rmrf(s"$work/warmckpt")
      val table = new LakeTable(spark, s"$work/lake")
      // diagnosis: tasks per executor — catches "all work on one executor" —
      // plus the shared per-stage wall/task-skew reporter
      val perExec = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Integer]()
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          perExec.merge(t.taskInfo.executorId, 1, (a, b) => a + b); ()
        }
      })
      spark.sparkContext.addSparkListener(StageStats.listener("[clab]  ", minWallMs = 2000))
      var events = 0L
      var lastT = System.nanoTime()
      val t0 = lastT
      CdcStream.start(spark, walDir, table, s"$work/ckpt",
        maxFilesPerTrigger = sys.env.getOrElse("SPARK_GRAFT_CLAB_FT", "96").toInt,
        createBuckets = 64, mode = "l0",
        onBatch = st => {
          val now = System.nanoTime()
          println(f"[clab]   batch ${st.batchId} events=${st.events} " +
            f"secs=${(now - lastT) / 1e9}%.1f")
          lastT = now
          events += st.events
        })
        .awaitTermination()
      val secs = (System.nanoTime() - t0) / 1e9
      println(s"[clab]   tasks/executor: ${perExec}")
      rmrf(work)
      (events, secs)
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val nEvents = args(0).toLong
    val pairs = args(1).toInt
    val coresPerWorker = if (args.length > 2) args(2).toInt else 4
    val (wLo, wHi): (Int, Int) =
      if (args.length > 3) { val a = args(3).split(","); (a(0).toInt, a(1).toInt) }
      else (1, 4)
    val memMb = sys.env.getOrElse("SPARK_GRAFT_CLAB_MEM", "12288").toInt
    new java.io.File(scratch).mkdirs()

    val wal = s"$scratch/clab-wal-$nEvents"
    locally {
      val gen = SparkSession.builder().master("local[16]").appName("clab-gen")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false").getOrCreate()
      try {
        gen.sparkContext.setLogLevel("ERROR")
        if (!new java.io.File(wal).exists())
          ChangeGen.writeWal(gen, GenConfig(events = nEvents, segmentSize = nEvents / 96), wal)
      } finally gen.stop()
    }

    // interleaved timed pairs (the BASELINE.md protocol: interleaving
    // cancels slow box-state drift); per-run in-session warmup replaces the
    // cross-run warmup pair (fresh executor JVMs per run)
    val runs = (1 to pairs).map { i =>
      val lo = oneRun(wLo, coresPerWorker, memMb, wal)
      val hi = oneRun(wHi, coresPerWorker, memMb, wal)
      println(f"[clab] pair $i: ${wLo}x$coresPerWorker=${lo._1 / lo._2}%.0f ev/s " +
        f"(${lo._2}%.1f s)  ${wHi}x$coresPerWorker=${hi._1 / hi._2}%.0f ev/s (${hi._2}%.1f s)")
      (lo._1 / lo._2, hi._1 / hi._2)
    }
    val scale = wHi.toDouble / wLo
    val bestLo = runs.map(_._1).max
    val bestHi = runs.map(_._2).max
    val medLo = runs.map(_._1).sorted.apply(runs.size / 2)
    val medHi = runs.map(_._2).sorted.apply(runs.size / 2)
    println(f"[clab] == executors ${wLo}->${wHi} (x$coresPerWorker cores, separate JVMs): " +
      f"best $bestLo%.0f -> $bestHi%.0f ev/s eff=${bestHi / (scale * bestLo)}%.3f, " +
      f"median $medLo%.0f -> $medHi%.0f eff=${medHi / (scale * medLo)}%.3f ==")
  }
}
