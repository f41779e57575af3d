package graft.formats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Zeek TSV log parser: typed header directives (`#separator`, `#fields`,
  * `#types`, `#unset_field`, `#empty_field`) drive a typed columnar parse of
  * the data rows — all row parsing is Catalyst column logic; only the tiny
  * header block is read driver-side (it is metadata, like a parquet footer).
  *
  * Reference: `/root/reference/libtenzir/builtins/formats/zeek_tsv.cpp`
  * (header directive table at :245, per-type value parsers at :108-148,
  * unset/empty handling at :213-231).
  */
object Zeek {

  case class Header(
      separator: String,
      setSeparator: String,
      emptyField: String,
      unsetField: String,
      path: String,
      fields: Seq[String],
      types: Seq[String])

  /** Parse the `#...` directive block from the first lines of a log. */
  def parseHeader(headerLines: Seq[String]): Header = {
    // #separator is space-delimited (it defines the separator!); everything
    // after uses the declared separator.
    val sepDirective = headerLines.find(_.startsWith("#separator"))
      .getOrElse(sys.error("zeek log missing #separator"))
    val sep = unescapeSeparator(sepDirective.stripPrefix("#separator").trim)
    def directive(name: String): Option[Seq[String]] =
      headerLines.find(_.startsWith(s"#$name")).map(_.split(java.util.regex.Pattern.quote(sep)).toSeq.drop(1))
    Header(
      separator = sep,
      setSeparator = directive("set_separator").map(_.headOption.getOrElse(",")).getOrElse(","),
      emptyField = directive("empty_field").map(_.headOption.getOrElse("(empty)")).getOrElse("(empty)"),
      unsetField = directive("unset_field").map(_.headOption.getOrElse("-")).getOrElse("-"),
      path = directive("path").map(_.headOption.getOrElse("")).getOrElse(""),
      fields = directive("fields").getOrElse(sys.error("zeek log missing #fields")),
      types = directive("types").getOrElse(sys.error("zeek log missing #types")))
  }

  private def unescapeSeparator(s: String): String =
    if (s.startsWith("\\x")) Integer.parseInt(s.drop(2), 16).toChar.toString else s

  /** Typed column for one zeek field value (reference type parsers
    * `zeek_tsv.cpp:108-148`): time → timestamp_ntz from epoch seconds,
    * interval → double seconds, count/int/port → long, bool `T`/`F`,
    * `set[...]`/`vector[...]`/`table[...]` → array of strings.
    */
  def typedColumn(raw: Column, zeekType: String, h: Header): Column = {
    val v = when(raw === h.unsetField, lit(null)).otherwise(raw)
    zeekType match {
      // cast to NTZ so parquet output stays naive (session is UTC; the
      // engine's timestamps are uniformly naive)
      case "time" => timestamp_micros((v.cast("double") * 1e6).cast("long")).cast("timestamp_ntz")
      case "interval" => v.cast("double")
      case "count" | "int" | "port" => v.cast("long")
      case "double" => v.cast("double")
      case "bool" => when(v === "T", true).when(v === "F", false).otherwise(lit(null).cast("boolean"))
      case t if t.startsWith("set[") || t.startsWith("vector[") || t.startsWith("table[") =>
        when(v === h.emptyField, array().cast("array<string>"))
          .otherwise(split(v, java.util.regex.Pattern.quote(h.setSeparator)))
      case _ => v // string, addr, enum, subnet stay strings
    }
  }

  /** Parse a DataFrame of raw zeek log lines (column `lineCol`): reads the
    * directive header from the first rows (driver-side metadata read), then
    * emits one typed column per `#fields` entry. Data rows only — directive
    * and `#close` lines are dropped.
    */
  def parse(lines: DataFrame, lineCol: String = "line"): DataFrame = {
    import lines.sparkSession.implicits._
    val headerLines = lines.filter(col(lineCol).startsWith("#"))
      .select(lineCol).as[String].take(16).toSeq
    val h = parseHeader(headerLines)
    val parts = split(col(lineCol), java.util.regex.Pattern.quote(h.separator))
    val cols = h.fields.zip(h.types).zipWithIndex.map { case ((f, t), i) =>
      typedColumn(element_at(parts, i + 1), t, h).as(f.replace('.', '_'))
    }
    lines.filter(!col(lineCol).startsWith("#")).select(cols: _*)
  }

  /** Printed form of one typed column (inverse of [[typedColumn]]). */
  private def printedColumn(c: Column, zeekType: String, h: Header): Column = {
    val printed = zeekType match {
      case "time" =>
        format_string("%.6f", unix_micros(c.cast("timestamp")).cast("double") / 1e6)
      // three-valued: null must fall through to the unset coalesce below —
      // a bare otherwise("F") would print unset bools as false
      case "bool" => when(c.isNull, lit(null: String)).when(c, "T").otherwise("F")
      case t if t.startsWith("set[") || t.startsWith("vector[") || t.startsWith("table[") =>
        when(size(c) === 0, h.emptyField).otherwise(array_join(c, h.setSeparator))
      case _ => c.cast("string")
    }
    coalesce(printed, lit(h.unsetField))
  }

  /** `write_zeek_tsv` (reference `zeek_tsv.cpp` printer): a typed DataFrame →
    * one `line` column of directive header rows + TSV data rows, round-trips
    * through [[parse]]. Column order follows `fields`; `types` are the zeek
    * type names to print under.
    */
  def print(df: DataFrame, path: String, fields: Seq[String], types: Seq[String],
      separator: String = "\t"): DataFrame = {
    val h = Header(separator, ",", "(empty)", "-", path, fields, types)
    val sep = separator
    val header = Seq(
      "#separator " + (if (sep == "\t") "\\x09" else sep),
      s"#set_separator$sep${h.setSeparator}",
      s"#empty_field$sep${h.emptyField}",
      s"#unset_field$sep${h.unsetField}",
      s"#path$sep$path",
      (s"#fields" +: fields).mkString(sep),
      (s"#types" +: types).mkString(sep))
    import df.sparkSession.implicits._
    val headerDf = header.toDF("line")
    val rows = df.select(concat_ws(sep,
      fields.zip(types).map { case (f, t) =>
        printedColumn(col(f.replace('.', '_')), t, h)
      }: _*).as("line"))
    headerDf.unionByName(rows)
  }
}
