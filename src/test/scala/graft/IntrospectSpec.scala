package graft

import org.apache.spark.sql.functions._

import graft.cdc.CdcApply
import graft.gen.{ChangeGen, GenConfig}
import graft.lake.LakeTable
import graft.ops.{Introspect, ResultCache}

class IntrospectSpec extends SparkSpec {
  import spark.implicits._

  private lazy val table: LakeTable = {
    val t = new LakeTable(spark, tmpDir())
    val events = ChangeGen.events(spark, GenConfig(events = 3000, segmentSize = 512))
    CdcApply.applyBatchAppendRaw(t, events.toDF(), "is", 0L, createBuckets = 8)
    t
  }

  test("partitions/schemas/fields/metrics/version are queryable DataFrames") {
    val snap = table.currentSnapshot.get
    val parts = Introspect.partitions(table)
    assert(parts.count() == snap.files.size)
    // catalog state composes with the normal operator surface
    val byBucket = parts.groupBy("bucket").agg(sum("rows").as("rows")).collect()
    assert(byBucket.map(_.getAs[Long]("rows")).sum == snap.files.map(_.rows).sum)

    val schemas = Introspect.schemas(table)
    assert(schemas.filter(col("is_current")).count() == 1)

    val fields = Introspect.fields(table)
    val names = fields.filter(col("schema_id") === snap.currentSchemaId)
      .select("field").as[String].collect().toSet
    assert(Set("url", "warc_ts", "text", "_lsn", "_deleted").subsetOf(names))

    val metrics = Introspect.metrics(table)
    val m = metrics.collect()
    // at-least-once generator: delivered events >= distinct events
    assert(m.length == 1 && m(0).getAs[Long]("events") >= 3000L)

    assert(Introspect.version(spark).count() == 1)
  }

  test("refs lists tags and staged WAP commits; empty on a plain table") {
    assert(Introspect.refs(table).count() == 0)
    val snap = table.currentSnapshot.get
    table.tag("cut-1", snap.version)
    val events = ChangeGen.events(spark, GenConfig(events = 1000, segmentSize = 512))
    CdcApply.applyBatchAppendRaw(table, events.toDF(), "is-w", 0L, createBuckets = 8,
      stageAs = Some("pending"))
    val rows = Introspect.refs(table).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(rows.contains(("tag", "cut-1", snap.version)))
    assert(rows.exists { case (k, n, v) => k == "staged" && n == "pending" && v == snap.version })
    val staged = Introspect.refs(table).filter(col("kind") === "staged").head
    assert(staged.getAs[Long]("files") > 0 && staged.getAs[Long]("rows") > 0)
    // show() carries the refs aspect
    assert(Introspect.show(spark, Some(table))
      .filter(col("aspect") === "refs").count() == rows.size)
    table.dropStaged("pending"); table.dropTag("cut-1")
    assert(Introspect.refs(table).count() == 0)
  }

  test("ResultCache: named results with sliding read TTL and absolute write TTL") {
    var t = 0L
    val cache = new ResultCache(() => t)
    var builds = 0
    def mk = { builds += 1; Seq(1, 2, 3).toDF("x") }

    val a = cache.getOrPut("a", readTtlMs = 10)(mk)
    assert(builds == 1 && a.count() == 3)
    t = 5
    assert(cache.getOrPut("a", readTtlMs = 10)(mk).count() == 3 && builds == 1)
    t = 14 // last read at 5, ttl 10 → still live; read slides it
    assert(cache.get("a").isDefined)
    t = 30 // idle past the slid ttl → expired
    assert(cache.get("a").isEmpty)
    assert(cache.getOrPut("a", readTtlMs = 10)(mk).count() == 3 && builds == 2)

    // absolute write TTL expires even under constant reads
    cache.put("b", Seq(9).toDF("x"), readTtlMs = 100, writeTtlMs = 40)
    (31L to 69L by 5).foreach { tt => t = tt; assert(cache.get("b").isDefined) }
    t = 71
    assert(cache.get("b").isEmpty)
    // "a" idled past its read TTL during the b reads, so both are gone
    assert(cache.ids.isEmpty)
  }

  test("diagnostics bus collects reports; show unifies the aspects") {
    import org.apache.spark.sql.functions.{col => c}
    graft.ops.Diagnostics.clear()
    graft.ops.Diagnostics.warning("buffer_drop", "batch 3: dropped 5 of 20 rows")
    graft.ops.Diagnostics.error("commit", "stale base v7")
    val d = graft.ops.Diagnostics.df(spark)
    assert(d.columns.toSeq == Seq("ts", "severity", "source", "message"))
    assert(d.count() == 2)
    assert(d.filter(c("severity") === "error").select("source").head().getString(0) == "commit")

    val sh = Introspect.show(spark)
    assert(sh.columns.toSeq == Seq("aspect", "data"))
    val aspects = sh.select("aspect").distinct().collect().map(_.getString(0)).toSet
    assert(aspects == Set("version", "plugins", "diagnostics"))
    // rows are the union of the tagged sources, rendered as JSON records
    assert(sh.filter(c("aspect") === "diagnostics").count() == 2)
    assert(sh.filter(c("aspect") === "version")
      .select("data").head().getString(0).contains("\"engine\":\"graft\""))
    graft.ops.Diagnostics.clear()
  }

  test("plugins registry is queryable and covers every kind") {
    val p = Introspect.plugins(spark)
    assert(p.columns.toSeq == Seq("name", "kind", "module"))
    val kinds = p.select("kind").distinct().collect().map(_.getString(0)).toSet
    assert(Set("operator", "format", "context", "connector", "function_module",
      "storage", "language").subsetOf(kinds))
    assert(p.filter(org.apache.spark.sql.functions.col("kind") === "format").count() >= 10)
    // names are unique within a kind
    assert(p.count() == p.dropDuplicates("name", "kind").count())
  }
}
