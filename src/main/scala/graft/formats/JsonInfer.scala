package graft.formats

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSON schema inference and multi-schema selector routing — the Spark-first
  * rendering of the reference's `multi_series_builder` policies
  * (`/root/reference/libtenzir/include/tenzir/multi_series_builder.hpp:283-316`):
  *
  *  - '''merge''' policy → ONE inferred schema over the whole stream
  *    ([[parseInferred]]): Spark's distributed JSON schema inference
  *    (`spark.read.json` runs inference as a parallel job over every
  *    executor, merging field sets and widening types — exactly the
  *    merge-policy contract) followed by a codegen'd `from_json`.
  *  - '''precise / selector''' policy → one schema PER selector value
  *    ([[routeBySelector]]): events are routed by a selector field
  *    (`json.cpp --selector field:prefix`) and each route gets its own
  *    inferred schema, like the reference's per-schema series builders.
  */
object JsonInfer {

  /** Infer the schema of a JSON string column with Spark's native
    * distributed inference (one parallel pass; sampling via
    * `samplingRatio` < 1.0 for very large inputs).
    */
  def inferSchema(json: Dataset[String], samplingRatio: Double = 1.0): StructType =
    json.sparkSession.read
      .option("samplingRatio", samplingRatio)
      .json(json).schema

  /** Parse `jsonCol` with an inferred schema, keeping all other columns:
    * adds `parsedCol` as a struct typed by the inferred schema.
    */
  def parseInferred(df: DataFrame, jsonCol: String, parsedCol: String = "parsed",
      samplingRatio: Double = 1.0): DataFrame = {
    import df.sparkSession.implicits._
    val schema = inferSchema(df.select(col(jsonCol)).as[String], samplingRatio)
    df.withColumn(parsedCol, from_json(col(jsonCol), schema))
  }

  /** Route a multi-schema JSON stream by a selector field: one DataFrame per
    * distinct selector value, each parsed with ITS OWN inferred schema. The
    * selector set is collected driver-side — it is the number of event
    * *schemas* (bounded, like the reference's builder map), not event count.
    *
    * The input is cached for the duration of the k+1 driver-side passes
    * (key distinct + one inference per route) so the upstream lineage is
    * scanned once, not k+1 times, then unpersisted — the returned
    * DataFrames carry only the baked schemas, no cache dependency. For very
    * large inputs set `samplingRatio` < 1.0: inference becomes a sampled
    * pass (the reference's builders likewise infer from the events seen).
    */
  def routeBySelector(df: DataFrame, jsonCol: String, selectorField: String,
      samplingRatio: Double = 1.0, namePrefix: Option[String] = None): Map[String, DataFrame] = {
    val sel = get_json_object(col(jsonCol), s"$$.$selectorField")
    // a DISTINCT single-column probe plan is persisted (persist returns
    // this.type, so persisting `df` itself would alias — and later evict —
    // any cache the CALLER holds on it); the probe also pins only the json
    // column, not the full row
    val probe = df.select(col(jsonCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val keys = probe.select(sel.as("k")).filter(col("k").isNotNull)
        .distinct().collect().map(_.getString(0))
      import df.sparkSession.implicits._
      keys.map { k =>
        val schema = inferSchema(probe.filter(sel === k).as[String], samplingRatio)
        val routed = df.filter(sel === k).withColumn("parsed", from_json(col(jsonCol), schema))
        // schema-name metadata (the reference's `--selector field:prefix`
        // naming and the `@name` event-metadata field,
        // `expressions.md:107-112`): each routed frame knows its name
        k -> namePrefix.fold(routed)(p => routed.withColumn("@name", lit(s"$p.$k")))
      }.toMap
    } finally probe.unpersist(blocking = false)
  }
}
