package graft.formats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's JSON-dialect readers (`read_gelf`, `read_suricata`,
  * `read_zeek_json` — all thin modes of `/root/reference/libtenzir/builtins/
  * formats/json.cpp`: framing + a fixed selector) re-expressed over the same
  * two primitives every JSON path here uses: distributed schema inference and
  * selector routing ([[JsonInfer]]).
  *
  * Each reader is a per-row Column transform + one inference pass — no
  * driver-side parsing, no UDFs; the parse itself is codegen'd `from_json`.
  */
object JsonStreams {

  /** `read_gelf`: Graylog Extended Log Format — a byte stream of
    * NUL-delimited JSON records (GELF TCP framing; `json.cpp` gelf mode).
    * Each input row may carry any number of frames: frames explode to one
    * row each, then parse with one inferred schema (standard fields
    * `version`/`host`/`short_message`/`timestamp`/`level` plus `_`-prefixed
    * custom fields, which inference keeps verbatim).
    */
  def readGelf(df: DataFrame, chunkCol: String, parsedCol: String = "parsed"): DataFrame = {
    // collision-proof scratch name: never silently clobber a user column
    val tmp = "__gelf_frame"
    require(!df.columns.contains(tmp), s"readGelf: input already has a '$tmp' column")
    val frames = df
      .withColumn(tmp, explode(split(col(chunkCol).cast("string"), "\\u0000")))
      .filter(length(col(tmp)) > 0)
    JsonInfer.parseInferred(frames, tmp, parsedCol).drop(tmp)
  }

  /** `read_suricata`: Suricata EVE NDJSON, one schema per `event_type`
    * (alert/flow/dns/…) — the selector-routing policy with the selector
    * fixed by the dialect (`json.cpp` suricata mode).
    */
  def readSuricata(df: DataFrame, jsonCol: String): Map[String, DataFrame] =
    JsonInfer.routeBySelector(df, jsonCol, "event_type", namePrefix = Some("suricata"))

  /** `read_zeek_json`: Zeek's JSON log stream, one schema per `_path`
    * (conn/dns/http/…) — selector routing with Zeek's path field
    * (`json.cpp` zeek-json mode; the TSV twin is [[Zeek]]).
    */
  def readZeekJson(df: DataFrame, jsonCol: String): Map[String, DataFrame] =
    JsonInfer.routeBySelector(df, jsonCol, "_path", namePrefix = Some("zeek"))
}
