package graft

import java.util.concurrent.ConcurrentLinkedQueue

import scala.concurrent.{Await, Future}
import scala.concurrent.ExecutionContext.Implicits.global
import scala.concurrent.duration.DurationInt

import graft.cdc.CdcApply
import graft.gen.{ChangeGen, GenConfig, GenEvent}
import graft.lake.LakeTable

/** TRUE concurrent multi-writer stress over the optimistic commit protocol:
  * two writer threads (distinct queryIds, separate [[LakeTable]] handles on
  * one root, like two driver processes) race batches into the same table,
  * retrying on [[java.util.ConcurrentModificationException]] — the Iceberg
  * commit loop. The atomic version-file claim plus the stale-base check must
  * yield a linear history containing EVERY batch exactly once, and the LWW
  * resolve makes the final state independent of the interleaving. Files
  * written by losing attempts become orphans and are swept.
  */
class ConcurrencySpec extends SparkSpec {
  import spark.implicits._

  val cfg = GenConfig(events = 6000, segmentSize = 512)
  lazy val allEvents: Seq[GenEvent] = ChangeGen.events(spark, cfg).collect().toSeq

  test("two racing writers with OCC retry loops land every batch; state converges") {
    val root = tmpDir()
    // pre-create so the writers never race table creation itself
    val bootstrap = new LakeTable(spark, root)
    CdcApply.applyBatchAppendRaw(bootstrap,
      spark.createDataset(allEvents.take(0)).toDF(), "boot", 0L, createBuckets = 8)

    val (evenSegs, oddSegs) = allEvents.partition(_.seg % 2 == 0)
    val retries = new ConcurrentLinkedQueue[String]()

    def runWriter(events: Seq[GenEvent], queryId: String): Future[Unit] = Future {
      val table = new LakeTable(spark, root) // own handle, like a separate driver
      val groups = events.grouped(math.max(1, events.size / 4 + 1)).toSeq
      groups.zipWithIndex.foreach { case (g, i) =>
        var attempts = 0
        var done = false
        while (!done) {
          try {
            CdcApply.applyBatchAppendRaw(table, spark.createDataset(g).toDF(),
              queryId, i.toLong, createBuckets = 8)
            done = true
          } catch {
            case _: java.util.ConcurrentModificationException =>
              attempts += 1
              retries.add(s"$queryId-$i")
              assert(attempts < 50, s"$queryId batch $i livelocked")
          }
        }
      }
    }

    val fa = runWriter(evenSegs, "wA")
    val fb = runWriter(oddSegs, "wB")
    Await.result(fa.zip(fb), 10.minutes)

    val table = new LakeTable(spark, root)
    // every batch of both writers landed exactly once (lineage counts events
    // as delivered; the two event sets are disjoint by construction)
    val byQuery = table.lineageLog.groupBy(_.queryId)
    assert(byQuery("wA").map(_.events).sum == evenSegs.size)
    assert(byQuery("wB").map(_.events).sum == oddSegs.size)
    // batches committed in order per query (watermark monotonicity held
    // under interleaving)
    Seq("wA", "wB").foreach { q =>
      val ids = byQuery(q).map(_.batchId)
      assert(ids == ids.sorted, s"$q committed out of order: $ids")
    }
    // the interleaved history resolves to the exact LWW golden state
    assert(pagesMap(table.pages()) == expectedMap(allEvents))
    // losing attempts left orphan files; the sweep collects them and the
    // state is unchanged
    table.expireSnapshots(keepLast = 1)
    assert(pagesMap(table.pages()) == expectedMap(allEvents))
  }
}
