package graft.formats

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** YAML parser: YAML documents → JSON strings (jackson-dataformat-yaml, on
  * Spark's own classpath) → the engine's JSON machinery (inference +
  * `from_json`). The YAML→JSON step is a narrow per-partition map — a
  * deserialization boundary like the multimodal codec, not expressible as a
  * Catalyst expression; everything downstream is declarative.
  *
  * Reference: `/root/reference/libtenzir/builtins/formats/yaml.cpp` (parses
  * one event per YAML document; multi-document streams via `---` markers).
  */
object Yaml {

  /** All documents of one YAML string, each as a canonical JSON string.
    * JVM-singleton mappers (jackson mappers are thread-safe after config).
    */
  def yamlDocsToJson(s: String): Seq[String] = {
    val yaml = YamlMappers.yaml
    val json = YamlMappers.json
    val it = yaml.readerFor(classOf[com.fasterxml.jackson.databind.JsonNode]).readValues[
      com.fasterxml.jackson.databind.JsonNode](s)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    while (it.hasNext) out += json.writeValueAsString(it.next())
    out.toSeq
  }

  /** Parse a (id, yaml) pair dataset: one output row per YAML document with
    * the id kept, the document as inferred-schema `parsed` struct plus the
    * canonical JSON string.
    */
  def parseWithId(pairs: Dataset[(Long, String)], parsedCol: String = "parsed"): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val js = pairs.flatMap { case (id, y) => yamlDocsToJson(y).map(id -> _) }
      .toDF("id", "js")
    JsonInfer.parseInferred(js, "js", parsedCol)
  }

  /** One JSON string → one YAML document (the `write_yaml` printer half;
    * reference `yaml.cpp` printer). Inverse of [[yamlDocsToJson]].
    */
  def jsonToYaml(js: String): String = {
    val node = YamlMappers.json.readTree(js)
    YamlMappers.yaml.writeValueAsString(node)
  }

  /** `write_yaml`: each row → one YAML document string (column `yaml`),
    * serialized through `to_json(struct(*))` then remapped by jackson — the
    * same narrow per-row boundary as the parser, in reverse.
    */
  def print(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(to_json(struct(df.columns.map(col).toIndexedSeq: _*)).as("js"))
      .as[String].map(jsonToYaml).toDF("yaml")
  }

  private object YamlMappers {
    lazy val yaml = new com.fasterxml.jackson.dataformat.yaml.YAMLMapper()
    lazy val json = com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
  }
}
