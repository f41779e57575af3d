package graft

import java.nio.file.{Files, Path}
import java.util.Comparator

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.gen.GenEvent

/** Shared local SparkSession for all suites (one per forked test JVM). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = {
    val s = sparkBuilder.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def sparkBuilder = SparkSession.builder()
    .master("local[8]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false")

  private val scratchDirs = new java.util.concurrent.ConcurrentLinkedQueue[Path]

  def tmpDir(prefix: String = "graft"): String = {
    val p = Files.createTempDirectory(prefix)
    scratchDirs.add(p)
    p.toString
  }

  override def afterAll(): Unit = {
    try super.afterAll()
    finally {
      scratchDirs.forEach { p =>
        try {
          if (Files.exists(p)) {
            val walk = Files.walk(p)
            try walk.sorted(Comparator.reverseOrder[Path]())
              .forEach(f => Files.deleteIfExists(f))
            finally walk.close()
          }
        } catch { case _: java.io.IOException => () }
      }
      scratchDirs.clear()
    }
  }

  /** Independent LWW oracle: fold events in (lsn, wal_part) order; deletes
    * remove. Duplicates (same lsn) are naturally idempotent. Returns live rows.
    */
  def expectedState(events: Seq[GenEvent]): Map[String, GenEvent] = {
    val m = scala.collection.mutable.Map.empty[String, GenEvent]
    events.distinctBy(e => (e.lsn, e.wal_part))
      .sortBy(e => (e.lsn, e.wal_part))
      .foreach(e => m(e.url) = e)
    m.filter(_._2.op != "D").toMap
  }

  /** Canonical comparable view of the lake pages table: url → (text, lang, ts-millis, html-hash). */
  def pagesMap(df: org.apache.spark.sql.DataFrame): Map[String, (String, String, Long, Int)] =
    df.collect().map { r =>
      val url = r.getAs[String]("url")
      val html = r.getAs[Array[Byte]]("html")
      url -> (r.getAs[String]("text"), r.getAs[String]("lang"),
        r.getAs[java.sql.Timestamp]("warc_ts").getTime,
        if (html == null) 0 else java.util.Arrays.hashCode(html))
    }.toMap

  def expectedMap(events: Seq[GenEvent]): Map[String, (String, String, Long, Int)] =
    expectedState(events).map { case (url, e) =>
      url -> (e.text, e.lang, e.warc_ts.getTime,
        if (e.html == null) 0 else java.util.Arrays.hashCode(e.html))
    }
}
