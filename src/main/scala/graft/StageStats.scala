package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}

/** Shared per-stage wall-time + task-skew reporter (straggler diagnosis) for
  * the measurement labs: for each completed stage ≥ `minWallMs`, prints wall
  * time, task count, and median/max task runtime. One implementation so a
  * fix (e.g. the cross-stage task-time retention) lands everywhere.
  */
object StageStats {

  def listener(prefix: String, minWallMs: Long = 0L): SparkListener = new SparkListener {
    private val taskTimes = new java.util.concurrent.ConcurrentHashMap[Int,
      java.util.concurrent.ConcurrentLinkedQueue[Long]]()

    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      taskTimes.computeIfAbsent(t.stageId,
        _ => new java.util.concurrent.ConcurrentLinkedQueue[Long]())
        .add(t.taskInfo.duration); ()
    }

    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
      val info = s.stageInfo
      val wall = (for { a <- info.completionTime; b <- info.submissionTime }
        yield a - b).getOrElse(-1L)
      val ts = Option(taskTimes.remove(info.stageId)).map { q =>
        import scala.jdk.CollectionConverters._
        q.asScala.toSeq.sorted
      }.getOrElse(Seq.empty)
      if (wall >= minWallMs) {
        val med = if (ts.nonEmpty) ts((ts.size - 1) / 2) / 1e3 else -1.0
        val mx = if (ts.nonEmpty) ts.last / 1e3 else -1.0
        println(f"$prefix stage ${info.stageId}%3d wall=${wall / 1e3}%7.2fs " +
          f"tasks=${info.numTasks}%3d taskMed=$med%6.2fs taskMax=$mx%6.2fs  " +
          s"${info.name.takeWhile(_ != '(').trim}")
      }
    }
  }
}
