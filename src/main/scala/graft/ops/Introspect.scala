package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, struct, to_json}
import org.apache.spark.sql.types.StructType

import graft.lake.LakeTable

/** Introspection sources (reference
  * `/root/reference/libtenzir/builtins/operators/partitions.cpp`,
  * `schemas.cpp`, `fields.cpp`, `version.cpp`, and the `metrics` operator):
  * node/table state exposed as ordinary DataFrames, so catalog state is
  * queryable with the same operator surface as data — `partitions(t) |
  * where(...) | summarize(...)` works exactly like the reference's
  * `partitions | where ...` idiom.
  *
  * All of these build from driver-side metadata (manifest JSON, lineage log)
  * — tiny frames, no data IO, mirroring the reference's catalog-only reads.
  */
object Introspect {

  /** One row per data file (the reference's `partitions` source: id, schema,
    * events, store size, synopsis ranges — `partitions.cpp:239`).
    */
  def partitions(table: LakeTable): DataFrame = {
    val snap = table.currentSnapshot.getOrElse(sys.error("no table"))
    import table.spark.implicits._
    table.spark.createDataset(snap.files.map(f =>
      (snap.version, f.bucket, f.path, f.schemaId, f.rows, f.bytes,
        f.minLsn, f.maxLsn, f.minUrlHash, f.maxUrlHash)))
      .toDF("version", "bucket", "path", "schema_id", "rows", "bytes",
        "min_lsn", "max_lsn", "min_urlhash", "max_urlhash")
  }

  /** One row per registered schema version (`schemas.cpp:107`). */
  def schemas(table: LakeTable): DataFrame = {
    val snap = table.currentSnapshot.getOrElse(sys.error("no table"))
    import table.spark.implicits._
    table.spark.createDataset(snap.schemas.toSeq.map { case (id, json) =>
      (id.toInt, id.toInt == snap.currentSchemaId, json)
    }).toDF("schema_id", "is_current", "schema_json")
  }

  /** One row per (schema, field) with type and nullability (`fields.cpp:240`). */
  def fields(table: LakeTable): DataFrame = {
    val snap = table.currentSnapshot.getOrElse(sys.error("no table"))
    import table.spark.implicits._
    table.spark.createDataset(for {
      (id, json) <- snap.schemas.toSeq
      f <- org.apache.spark.sql.types.DataType.fromJson(json)
        .asInstanceOf[StructType].fields.toSeq
    } yield (id.toInt, f.name, f.dataType.simpleString, f.nullable))
      .toDF("schema_id", "field", "type", "nullable")
  }

  /** Per-batch apply metrics from the durable lineage log (the reference's
    * `metrics` operator over `tenzir.metrics.*` — ours are per-commit apply
    * stats: events, upserts, deletes, lsn range, snapshot version).
    */
  def metrics(table: LakeTable): DataFrame = {
    import table.spark.implicits._
    table.spark.createDataset(table.lineageLog.map(e =>
      (e.queryId, e.batchId, e.events, e.upserts, e.deletes, e.minLsn, e.maxLsn,
        e.snapshotVersion)))
      .toDF("query_id", "batch_id", "events", "upserts", "deletes",
        "min_lsn", "max_lsn", "snapshot_version")
  }

  /** One row per named ref: tags (name → pinned version) and staged WAP
    * commits (id → base version + pending file/row counts) — the Iceberg
    * `refs`/metadata-table angle on [[LakeTable.tags]] and
    * [[LakeTable.stagedIds]]. Driver-side metadata only.
    */
  def refs(table: LakeTable): DataFrame = {
    import table.spark.implicits._
    val tagRows = table.tags.toSeq.map { case (n, v) => ("tag", n, v, 0L, 0L) }
    val stagedRows = table.stagedIds.map { id =>
      val s = table.stagedSnapshot(id)
      ("staged", id, s.version, s.files.size.toLong, s.files.map(_.rows).sum)
    }
    table.spark.createDataset(tagRows ++ stagedRows)
      .toDF("kind", "name", "version", "files", "rows")
  }

  /** Engine/runtime version row (`version.cpp:185`). */
  def version(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.createDataset(Seq(
      ("graft", "2.0", spark.version, scala.util.Properties.versionNumberString)))
      .toDF("engine", "engine_version", "spark_version", "scala_version")
  }

  /** The reference's `show` unified introspection (`show.cpp:148` — every
    * aspect as one stream of tagged records): each source's rows rendered as
    * `(aspect, data-json)`, unioned. Table-backed aspects appear only when a
    * table is given.
    */
  def show(spark: SparkSession, table: Option[LakeTable] = None): DataFrame = {
    def tag(name: String, df: DataFrame): DataFrame =
      df.select(lit(name).as("aspect"),
        to_json(struct(df.columns.map(col).toIndexedSeq: _*)).as("data"))
    val base = Seq("version" -> version(spark), "plugins" -> plugins(spark),
      "diagnostics" -> Diagnostics.df(spark))
    val tbl = table.toSeq.flatMap(t => Seq("partitions" -> partitions(t),
      "schemas" -> schemas(t), "fields" -> fields(t), "metrics" -> metrics(t),
      "refs" -> refs(t)))
    (base ++ tbl).map { case (n, d) => tag(n, d) }.reduce(_ unionByName _)
  }

  /** One row per available operator/function/format (the reference's
    * `plugins` source / `show plugins` — a static registry there too:
    * `plugins.cpp` walks the linked plugin list). Queryable like any data:
    * `plugins(spark).where($"kind" === "format")`.
    */
  def plugins(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val reg: Seq[(String, String, String)] =
      Seq("where", "select", "drop", "set", "rename", "move", "flatten",
        "unflatten", "unroll", "enumerate", "deduplicate", "deduplicate_distance",
        "unique", "sort", "reverse", "slice", "head", "tail", "taste", "top",
        "rare", "summarize", "if_else", "fork", "sample", "sample_adaptive",
        "sample_rate", "repeat", "assert", "enrich", "chart", "timeshift")
        .map((_, "operator", "graft.ops.Pipe")) ++
      Seq("windowed_summarize", "sliding_summarize", "session_summarize",
        "dedup_within_watermark", "delay", "throttle", "buffer_drop")
        .map((_, "operator", "graft.streaming.StreamOps")) ++
      Seq("exact_dedup", "minhash_lsh", "simhash", "ngram_jaccard",
        "embedding_dup").map((_, "operator", "graft.ops.Dedup")) ++
      Seq("ann_bruteforce", "ann_lsh").map((_, "operator", "graft.ops.Similarity")) ++
      Seq("pseudonymize").map((_, "operator", "graft.ops.Privacy")) ++
      Seq("shell").map((_, "operator", "graft.ops.Shell")) ++
      Seq("grok", "syslog_rfc3164", "syslog_rfc5424", "cef", "leef",
        "zeek_tsv", "yaml", "json_infer", "json_route", "sigma", "pcap",
        "decapsulate", "csv", "kv", "lines", "json",
        "gelf", "suricata", "zeek_json", "tsv", "ssv", "ndjson",
        "write_kv", "write_tql",
        "compress_gzip", "compress_zlib", "compress_lz4", "compress_zstd",
        "compress_bz2", "decompress_gzip", "decompress_zlib", "decompress_lz4",
        "decompress_zstd", "decompress_bz2", "feather", "bitz")
        .map((_, "format", "graft.formats")) ++
      Seq("cron").map((_, "operator", "graft.streaming.Cron")) ++
      Seq("lookup_table", "lookup_table_ttl", "subnet_prefix", "bloom_filter",
        "range_geoip").map((_, "context", "graft.ops.Contexts")) ++
      Seq("stdin", "stdout", "tcp", "udp", "http", "files", "file_contents",
        "processes", "sockets", "nics").map((_, "connector", "graft.sources")) ++
      Seq("serve", "cache", "publish", "subscribe")
        .map((_, "connector", "graft.ops")) ++
      Seq(("show", "operator", "graft.ops.Introspect"),
        ("diagnostics", "operator", "graft.ops.Diagnostics")) ++
      Seq("text", "ip", "ocsf", "hash", "time", "string", "numeric", "bit",
        "list").map((_, "function_module", "graft.functions")) ++
      Seq(("tql", "language", "graft.tql.Tql"),
        ("import", "storage", "graft.lake.LakeTable"),
        ("export", "storage", "graft.lake.LakeTable"),
        ("compact", "storage", "graft.lake.LakeTable"),
        ("changes", "storage", "graft.lake.LakeTable"),
        ("wap_stage", "storage", "graft.lake.LakeTable"),
        ("tags", "storage", "graft.lake.LakeTable"),
        ("cdc_apply", "storage", "graft.cdc.CdcApply"),
        ("audited_ingest", "operator", "graft.cdc.CdcStream"),
        ("follow_changes", "operator", "graft.cdc.CdcStream"),
        ("matview", "operator", "graft.ops.MatView"))
    spark.createDataset(reg).toDF("name", "kind", "module")
  }
}
