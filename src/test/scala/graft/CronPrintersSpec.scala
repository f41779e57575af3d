package graft

import java.time.Instant

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.formats.Printers
import graft.streaming.Cron

/** Cron next-fire scheduling + the remaining event→bytes printers. */
class CronPrintersSpec extends SparkSpec {
  import spark.implicits._

  private def next(expr: String, after: String): String =
    Cron.nextAfter(expr, Instant.parse(after)).map(_.toString).orNull

  test("cron nextAfter golden cases") {
    // every 5 minutes
    assert(next("*/5 * * * *", "2026-03-01T10:02:00Z") == "2026-03-01T10:05:00Z")
    // exactly on a fire time → strictly next
    assert(next("*/5 * * * *", "2026-03-01T10:05:00Z") == "2026-03-01T10:10:00Z")
    // daily at 09:30
    assert(next("30 9 * * *", "2026-03-01T10:00:00Z") == "2026-03-02T09:30:00Z")
    // weekdays at 09:00 — Mar 1 2026 is a Sunday
    assert(next("0 9 * * 1-5", "2026-03-01T00:00:00Z") == "2026-03-02T09:00:00Z")
    // 1st and 15th of the month
    assert(next("0 0 1,15 * *", "2026-03-02T00:00:00Z") == "2026-03-15T00:00:00Z")
    // yearly: Feb 29 only exists in leap years
    assert(next("0 0 29 2 *", "2026-03-01T00:00:00Z") == "2028-02-29T00:00:00Z")
    // dom OR dow when both restricted (POSIX): the 13th OR any Friday
    assert(next("0 0 13 * 5", "2026-03-01T00:00:00Z") == "2026-03-06T00:00:00Z") // Fri 6th
    // dow 7 == Sunday
    assert(next("0 12 * * 7", "2026-03-02T00:00:00Z") == "2026-03-08T12:00:00Z")
    // range with step in hours
    assert(next("0 9-17/4 * * *", "2026-03-01T14:00:00Z") == "2026-03-01T17:00:00Z")
    // impossible date → None
    assert(next("0 0 30 2 *", "2026-01-01T00:00:00Z") == null)
    intercept[IllegalArgumentException](Cron.parse("* * * *"))
    // Vixie star rule: a step-on-star dom ("*/2") keeps the star flag, so a
    // restricted dow INTERSECTS (Mondays on odd days), not ORs
    assert(next("0 0 */2 * 1", "2026-03-03T00:00:00Z") == "2026-03-09T00:00:00Z")
    // Feb 29 across the 2100 non-leap century year needs the 8-year horizon
    assert(next("0 0 29 2 *", "2096-03-01T00:00:00Z") == "2104-02-29T00:00:00Z")
  }

  test("cron schedule re-syncs to the wall clock when the body outruns the cadence") {
    val fires = scala.collection.mutable.ArrayBuffer.empty[String]
    var now = Instant.parse("2026-03-01T10:02:00Z")
    Cron.schedule("*/5 * * * *", maxRuns = 3,
      clock = () => now,
      sleeper = ms => now = now.plusMillis(ms)) { fire =>
      fires += fire.toString
      now = now.plusSeconds(720) // 12-minute body > 5-minute cadence
    }
    // missed slots are skipped — no stale catch-up burst
    assert(fires.toSeq == Seq("2026-03-01T10:05:00Z", "2026-03-01T10:20:00Z",
      "2026-03-01T10:35:00Z"))
  }

  test("cron schedule fires the body at each computed time via injected clock") {
    val fires = scala.collection.mutable.ArrayBuffer.empty[String]
    val slept = scala.collection.mutable.ArrayBuffer.empty[Long]
    var now = Instant.parse("2026-03-01T10:02:10Z")
    val n = Cron.schedule("*/5 * * * *", maxRuns = 3,
      clock = () => now,
      sleeper = ms => { slept += ms; now = now.plusMillis(ms) }) { fire =>
      fires += fire.toString
    }
    assert(n == 3)
    assert(fires.toSeq == Seq("2026-03-01T10:05:00Z", "2026-03-01T10:10:00Z",
      "2026-03-01T10:15:00Z"))
    assert(slept.head == 170000L && slept.tail.forall(_ == 300000L))
  }

  test("kvLine prints k=v pairs in field order and skips nulls") {
    val sch = StructType(Seq(StructField("id", LongType), StructField("t", StringType),
      StructField("u", LongType)))
    val df = Seq((1L, "login", Some(7L)), (2L, "buy", None))
      .toDF("id", "t", "u")
    val out = df.select(Printers.kvLine(struct(col("id"), col("t"), col("u")), sch).as("line"))
      .as[String].collect().sorted.toSeq
    assert(out == Seq("id=1 t=login u=7", "id=2 t=buy"))
    // custom separators
    val sch2 = StructType(sch.fields.take(2))
    val o2 = df.filter(col("id") === 1)
      .select(Printers.kvLine(struct(col("id"), col("t")), sch2, fieldSep = ";", valueSep = ":"))
      .as[String].head()
    assert(o2 == "id:1;t:login")
  }

  test("tqlLiteral renders records in TQL literal syntax incl. nulls and escaping") {
    val sch = StructType(Seq(StructField("id", LongType), StructField("t", StringType),
      StructField("n", StructType(Seq(StructField("u", LongType))))))
    val df = Seq((1L, "say \"hi\"", 7L), (2L, null.asInstanceOf[String], 8L)).toDF("id", "t", "u")
    val out = df.select(Printers.tqlLiteral(
        struct(col("id"), col("t"), struct(col("u")).as("n")), sch).as("line"))
      .as[String].collect().sorted.toSeq
    assert(out == Seq(
      "{id: 1, t: \"say \\\"hi\\\"\", n: {u: 7}}",
      "{id: 2, t: null, n: {u: 8}}"))

    // backslashes escape BEFORE quotes; a whole-null nested record is `null`
    val df2 = Seq((1L, "C:\\logs\\", 7L), (2L, "x", 8L)).toDF("id", "t", "u")
    val out2 = df2.select(Printers.tqlLiteral(struct(col("id"), col("t"),
        when(col("id") === 1, struct(col("u"))).as("n")), sch).as("line"))
      .as[String].collect().sorted.toSeq
    assert(out2 == Seq(
      "{id: 1, t: \"C:\\\\logs\\\\\", n: {u: 7}}",
      "{id: 2, t: \"x\", n: null}"))
  }

  test("xsv dialect round-trip: print then parse with tsv and ssv separators") {
    val sch = StructType(Seq(StructField("id", LongType), StructField("t", StringType)))
    val df = Seq((1L, "alpha"), (2L, "beta")).toDF("id", "t")
    for (sep <- Seq("\t", " ", ";")) {
      val rt = df.select(Printers.parseXsv(
          Printers.xsvLine(struct(col("id"), col("t")), sep), sch, sep).as("r"))
        .select(col("r.id"), col("r.t"))
      assert(rt.as[(Long, String)].collect().sortBy(_._1).toSeq ==
        Seq((1L, "alpha"), (2L, "beta")), s"sep=<$sep>")
    }
  }
}
