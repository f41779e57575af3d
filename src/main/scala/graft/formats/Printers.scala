package graft.formats

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructType, TimestampType}

/** The remaining event→bytes printers of the reference's format surface
  * (`/root/reference/libtenzir/builtins/formats/`): `write_kv` (kv.cpp),
  * `write_ndjson` (json.cpp NDJSON mode), `write_tql` (write_tql.cpp — events
  * as TQL record literals), and the xsv dialect presets `write_tsv` /
  * `write_ssv` (xsv.cpp). All pure Column compositions over built-in
  * expressions — codegen'd, no UDFs.
  */
object Printers {

  /** `write_kv`: struct → `k1=v1 k2=v2` with configurable separators
    * (kv.cpp's field/value separator options, printing direction).
    * Null fields are skipped (the reference prints only present fields).
    */
  def kvLine(s: Column, fieldSep: String = " ", valueSep: String = "="): Column = {
    val pairs = map_entries(from_json(to_json(s),
      org.apache.spark.sql.types.DataType.fromDDL("map<string,string>")))
    array_join(
      transform(filter(pairs, p => p.getField("value").isNotNull),
        p => concat(p.getField("key"), lit(valueSep), p.getField("value"))),
      fieldSep)
  }

  /** `write_ndjson`: struct → one JSON object per row — newline-delimited
    * when saved via the lines writer. Identical bytes to `to_json`; named for
    * the operator (json.cpp printer, NDJSON framing).
    */
  def ndjsonLine(s: Column): Column = to_json(s)

  /** `write_tql`: struct → a TQL record literal `{k: v, …}` (write_tql.cpp):
    * strings quoted with escaped inner quotes, numbers/bools bare, nulls
    * printed as `null`, nested records recursively.
    */
  def tqlLiteral(s: Column, schema: StructType): Column = {
    val parts = schema.fields.map { f =>
      val v = s.getField(f.name)
      val rendered = f.dataType match {
        case st: StructType => tqlLiteral(v, st)
        case org.apache.spark.sql.types.StringType =>
          concat(lit("\""), regexp_replace(v, "\"", "\\\\\""), lit("\""))
        case TimestampType => concat(lit("\""), date_format(v, "yyyy-MM-dd'T'HH:mm:ss"), lit("\""))
        case _ => v.cast("string")
      }
      concat(lit(s"${f.name}: "), coalesce(rendered, lit("null")))
    }
    concat(lit("{"), concat_ws(", ", parts.toIndexedSeq: _*), lit("}"))
  }

  /** xsv dialect presets (xsv.cpp registers csv/tsv/ssv as fixed-separator
    * instances of one parser/printer pair).
    */
  def xsvLine(s: Column, sep: String): Column =
    to_csv(s, Map("sep" -> sep).asJava)

  def parseXsv(line: Column, schema: StructType, sep: String): Column =
    from_csv(line, schema, Map("sep" -> sep))

  private implicit class MapOps(m: Map[String, String]) {
    def asJava: java.util.Map[String, String] = {
      val jm = new java.util.HashMap[String, String]()
      m.foreach { case (k, v) => jm.put(k, v) }
      jm
    }
  }
}
