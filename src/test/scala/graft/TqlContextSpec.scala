package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.tql.Tql

/** `context::*` statements — the TQL string surface over the Contexts
  * machinery (reference `web/docs/tql2/operators/context/`): create, update
  * (with per-entry TTLs), erase, enrich, inspect, list, reset, remove, and
  * the bloom-filter variant.
  */
class TqlContextSpec extends SparkSpec {
  import spark.implicits._

  override def afterAll(): Unit = {
    try Tql.ctxClearAll() finally super.afterAll()
  }

  private def fresh(name: String): String = { // unique per test, suite-shared JVM
    Tql.ctxClearAll(); name
  }

  private lazy val feed = Seq((1L, "a"), (2L, "b"), (3L, "c"))
    .toDF("x", "y")

  test("create → update → enrich joins the value under the context name") {
    fresh("ctx")
    Tql("""context::create_lookup_table "ctx"
           context::update "ctx", key=x, value=y""")(feed)
    val got = Tql("""context::enrich "ctx", key=k""")(
      Seq((1L, "one"), (4L, "four")).toDF("k", "label"))
    val rows = got.collect().map(r => r.getAs[Long]("k") ->
      Option(r.getAs[String]("ctx"))).toMap
    assert(rows == Map(1L -> Some("a"), 4L -> None))
  }

  test("update overwrites values per key; erase removes; inspect shows live entries") {
    fresh("ctx")
    Tql("""context::create_lookup_table "ctx"
           context::update "ctx", key=x, value=y""")(feed)
    Tql("""context::update "ctx", key=x, value=concat(y, "2")""")(
      Seq((2L, "B")).toDF("x", "y"))
    Tql("""context::erase "ctx", key=x""")(Seq(Tuple1(3L)).toDF("x"))
    val got = Tql("""context::inspect "ctx"""")(feed)
    val rows = got.collect().map(r => r.getAs[Long]("key") -> r.getAs[String]("value")).toMap
    assert(rows == Map(1L -> "a", 2L -> "B2"))
  }

  test("value defaults to `this` (the whole record, @-metadata excluded)") {
    fresh("ctx")
    Tql("""context::create_lookup_table "ctx"
           context::update "ctx", key=x""")(
      feed.withColumn("@import_time", lit(new java.sql.Timestamp(0))))
    val got = Tql("""context::inspect "ctx"""")(feed)
    val r = got.filter(col("key") === 2L).select("value.*").head()
    assert(r == Row(2L, "b"))
  }

  test("TTL: create_timeout and write_timeout expire entries; re-add mints a fresh creation") {
    fresh("ctx")
    val prev = graft.core.IngestClock.now
    try {
      var t = 1000000L
      graft.core.IngestClock.now = () => java.time.Instant.ofEpochMilli(t)
      Tql("""context::create_lookup_table "ctx"
             context::update "ctx", key=x, value=y, create_timeout=10s""")(
        Seq((1L, "a")).toDF("x", "y"))
      Tql("""context::update "ctx", key=x, value=y, write_timeout=5s""")(
        Seq((2L, "b")).toDF("x", "y"))
      def live(): Map[Long, String] =
        Tql("""context::inspect "ctx"""")(feed).collect()
          .map(r => r.getAs[Long]("key") -> r.getAs[String]("value")).toMap
      t += 4000 // +4s: both alive
      assert(live() == Map(1L -> "a", 2L -> "b"))
      t += 2000 // +6s: write_timeout=5s on key 2 expired; key 1 still alive
      assert(live() == Map(1L -> "a"))
      t += 5000 // +11s: create_timeout=10s on key 1 expired too
      assert(live() == Map.empty[Long, String])
      // refreshing an entry before expiry preserves created_ts: key counts
      // from FIRST creation, so a create_timeout still fires through updates
      t = 2000000L
      Tql("""context::update "ctx", key=x, value=y, create_timeout=10s""")(
        Seq((7L, "v1")).toDF("x", "y"))
      t += 8000
      Tql("""context::update "ctx", key=x, value=y, create_timeout=10s""")(
        Seq((7L, "v2")).toDF("x", "y"))
      assert(live() == Map(7L -> "v2"))
      t += 4000 // 12s after creation, 4s after refresh → create_timeout fires
      assert(live() == Map.empty[Long, String])
      // …and once expired, a new update is a fresh creation
      Tql("""context::update "ctx", key=x, value=y, create_timeout=10s""")(
        Seq((7L, "v3")).toDF("x", "y"))
      t += 9000
      assert(live() == Map(7L -> "v3"))
    } finally graft.core.IngestClock.now = prev
  }

  test("enrich with TTL'd entries drops expired matches (probe-time liveness)") {
    fresh("ctx")
    val prev = graft.core.IngestClock.now
    try {
      var t = 1000000L
      graft.core.IngestClock.now = () => java.time.Instant.ofEpochMilli(t)
      Tql("""context::create_lookup_table "ctx"
             context::update "ctx", key=x, value=y, write_timeout=5s""")(feed)
      t += 6000
      val got = Tql("""context::enrich "ctx", key=x, into=hit""")(feed)
      assert(got.filter(col("hit").isNotNull).count() == 0)
    } finally graft.core.IngestClock.now = prev
  }

  test("bloom filter: membership probe, no values, no erase") {
    fresh("bf")
    Tql("""context::create_bloom_filter "bf", capacity=1000, fp_probability=0.001
           context::update "bf", key=y""")(feed)
    val got = Tql("""context::enrich "bf", key=probe, into=hit""")(
      Seq("a", "c", "zzz-not-there-1", "zzz-not-there-2").toDF("probe"))
    val hits = got.collect().map(r => r.getAs[String]("probe") -> r.getAs[Boolean]("hit")).toMap
    assert(hits("a") && hits("c"))
    // real members always hit; with fp 0.001 both misses passing is ~1e-6
    assert(!hits("zzz-not-there-1") || !hits("zzz-not-there-2"))
    val e = intercept[RuntimeException] {
      Tql("""context::erase "bf", key=y""")(feed)
    }
    assert(e.getMessage.contains("lookup table"))
  }

  test("list / reset / remove lifecycle; named errors on misuse") {
    fresh("a")
    Tql("""context::create_lookup_table "a"
           context::create_bloom_filter "b"
           context::update "a", key=x, value=y""")(feed)
    val ls = Tql("""context::list""")(feed).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(ls.toSeq == Seq(("a", "lookup-table", 3L), ("b", "bloom-filter", 0L)))
    Tql("""context::reset "a"""")(feed)
    assert(Tql("""context::list""")(feed).filter(col("name") === "a")
      .head().getLong(2) == 0L)
    Tql("""context::remove "b"""")(feed)
    assert(Tql("""context::list""")(feed).count() == 1)
    assert(intercept[RuntimeException](Tql("""context::remove "b"""")(feed))
      .getMessage.contains("unknown context"))
    assert(intercept[RuntimeException](Tql("""context::create_lookup_table "a"""")(feed))
      .getMessage.contains("already exists"))
    assert(intercept[RuntimeException](
      Tql("""context::update "a", key=x, read_timeout=5s""")(feed))
      .getMessage.contains("read_timeout"))
    assert(intercept[RuntimeException](Tql("""context::nonsense "a"""")(feed))
      .getMessage.contains("unknown context operator"))
  }

  test("a field named 'context' still assigns (keyword guard)") {
    val got = Tql("""context = x * 2 | select x, context""")(feed)
    assert(got.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 2L), (2L, 4L), (3L, 6L)))
  }
}
