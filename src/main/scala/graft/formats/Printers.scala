package graft.formats

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType, TimestampType}

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
    * Schema-driven direct concat (one pass, no serialize/re-parse round trip);
    * null fields are skipped (the reference prints only present fields);
    * nested records render as JSON objects.
    */
  def kvLine(s: Column, schema: StructType,
      fieldSep: String = " ", valueSep: String = "="): Column = {
    val parts = schema.fields.map { f =>
      val v = s.getField(f.name)
      val rendered = f.dataType match {
        case _: StructType => to_json(v)
        case _ => v.cast("string")
      }
      when(v.isNotNull, concat(lit(f.name + valueSep), rendered))
    }
    array_join(filter(array(parts.toIndexedSeq: _*), _.isNotNull), fieldSep)
  }

  /** `write_ndjson`: struct → one JSON object per row — newline-delimited
    * when saved via the lines writer. Identical bytes to `to_json`; named for
    * the operator (json.cpp printer, NDJSON framing).
    */
  def ndjsonLine(s: Column): Column = to_json(s)

  /** `write_tql`: struct → a TQL record literal `{k: v, …}` (write_tql.cpp):
    * strings quoted (backslashes then inner quotes escaped), numbers/bools
    * bare, nulls printed as `null` (incl. a whole null nested record), nested
    * records recursively.
    */
  def tqlLiteral(s: Column, schema: StructType): Column = {
    val parts = schema.fields.map { f =>
      val v = s.getField(f.name)
      val rendered = f.dataType match {
        case st: StructType => when(v.isNotNull, tqlLiteral(v, st))
        case StringType =>
          // order matters: escape backslashes BEFORE quotes
          val esc = regexp_replace(regexp_replace(v, "\\\\", "\\\\\\\\"), "\"", "\\\\\"")
          concat(lit("\""), esc, lit("\""))
        case TimestampType =>
          concat(lit("\""), date_format(v, "yyyy-MM-dd'T'HH:mm:ss"), lit("\""))
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
}
