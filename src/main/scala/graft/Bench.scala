package graft

import org.apache.spark.sql.SparkSession

import graft.cdc.CdcStream
import graft.gen.{ChangeGen, GenConfig}
import graft.lake.LakeTable

/** Round benchmark. Two parts, one JSON line out:
  *
  *  1. '''CDC apply throughput''' — the authoritative metric
  *     (BASELINE.json): a deterministic WAL replayed through the streaming
  *     MERGE engine at two parallelism levels, local[8] (N) and local[32]
  *     (4N), same input, matched `spark.sql.shuffle.partitions` ≈ 2×cores.
  *     Reported: events/sec at both, and
  *     `efficiency = tp(4N) / (4 × tp(N))` (target ≥ 0.8). A small warmup
  *     replay precedes each timed run so JIT/classloading is excluded.
  *  2. '''Operator catalog timings''' — every SparkEntry query at the
  *     driver-provided SF dir, seconds each (count() as the action).
  *
  * Env knobs: SPARK_GRAFT_SF_DIR (query input), SPARK_GRAFT_CDC_EVENTS
  * (WAL size; default 2M ≈ ≥60 s at local[8]), SPARK_GRAFT_SKIP_QUERIES.
  */
object Bench {

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      .config("spark.sql.shuffle.partitions", (cores * 2).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** One full WAL replay into a fresh lake; returns (events applied, secs). */
  private def replay(spark: SparkSession, walDir: String, work: String): (Long, Double) = {
    var events = 0L
    val table = new LakeTable(spark, s"$work/lake")
    val t0 = System.nanoTime()
    CdcStream.start(spark, walDir, table, s"$work/ckpt",
      maxFilesPerTrigger = 16, createBuckets = 64,
      onBatch = st => events += st.events).awaitTermination()
    (events, (System.nanoTime() - t0) / 1e9)
  }

  private def cdcRun(cores: Int, walDir: String, warmupWal: String): (Long, Double) = {
    val spark = session(cores)
    try {
      val tmp = java.nio.file.Files.createTempDirectory(s"graft-bench-$cores")
      replay(spark, warmupWal, s"$tmp/warmup") // JIT/codegen warmup, untimed
      val (events, secs) = replay(spark, walDir, s"$tmp/timed")
      (events, secs)
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nEvents = sys.env.getOrElse("SPARK_GRAFT_CDC_EVENTS", "2000000").toLong

    // ---- generate the deterministic WAL once (not timed) ----
    val gen = session(32)
    val walRoot = java.nio.file.Files.createTempDirectory("graft-bench-wal").toString
    val mainWal = s"$walRoot/main"; val warmWal = s"$walRoot/warm"
    ChangeGen.writeWal(gen, GenConfig(events = nEvents, segmentSize = nEvents / 96), mainWal)
    ChangeGen.writeWal(gen, GenConfig(events = 100000, segmentSize = 25000), warmWal)
    gen.stop()

    // ---- CDC throughput at N and 4N (BASELINE.md sandbox protocol) ----
    val (ev8, sec8) = cdcRun(8, mainWal, warmWal)
    val (ev32, sec32) = cdcRun(32, mainWal, warmWal)
    val tp8 = ev8 / sec8
    val tp32 = ev32 / sec32
    val eff = tp32 / (4.0 * tp8)

    // ---- operator catalog timings ----
    val queryTimes: Seq[(String, Double)] =
      if (sys.env.contains("SPARK_GRAFT_SKIP_QUERIES")) Seq.empty
      else {
        val spark = session(32)
        try SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
          val t0 = System.nanoTime()
          try fn(spark, sfDir).count()
          catch { case e: Throwable => System.err.println(s"[bench] $name: ${e.getMessage}") }
          name -> (System.nanoTime() - t0) / 1e9
        } finally spark.stop()
      }

    val qs = queryTimes.map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")
    val totalQ = queryTimes.map(_._2).sum
    println(
      f"""{"metric":"cdc_apply_events_per_sec","value":$tp32%.0f,"unit":"events/sec","sf":"$sfDir",""" +
      f""""cdc":{"wal_events":$nEvents,"applied_events_n8":$ev8,"applied_events_n32":$ev32,""" +
      f""""secs_n8":$sec8%.1f,"secs_n32":$sec32%.1f,"throughput_n8":$tp8%.0f,"throughput_n32":$tp32%.0f,""" +
      f""""scaling_efficiency_n_to_4n":$eff%.3f},""" +
      f""""queries":$qs,"total_query_sec":$totalQ%.1f}""")
  }
}
