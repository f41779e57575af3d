package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  /** Engine/runtime version row (`version.cpp:185`). */
  def version(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.createDataset(Seq(
      ("graft", "2.0", spark.version, scala.util.Properties.versionNumberString)))
      .toDF("engine", "engine_version", "spark_version", "scala_version")
  }
}
