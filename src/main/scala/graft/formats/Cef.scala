package graft.formats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CEF and LEEF event parsers as pure Catalyst column logic.
  *
  * References: `/root/reference/libtenzir/builtins/formats/cef.cpp` (7-field
  * `CEF:version|vendor|product|device_version|sig_id|name|severity|ext`
  * header + space-separated `key=value` extension) and `leef.cpp` (LEEF
  * 1.0/2.0 header, v2.0 optional delimiter spec like `x09`, tab-delimited
  * attributes).
  *
  * The extension/attribute split here is the RE2-compatible core (`key=` runs
  * to the delimiter): values containing the delimiter require the reference's
  * stateful scan, which SQL regex cannot express without lookahead — the
  * FormatSpec covers that gap Java-side.
  */
object Cef {

  private def part(line: Column, i: Int): Column = split_part(line, lit("|"), lit(i))

  /** CEF header columns (severity kept as string — the spec allows words). */
  def headerColumns(line: Column): Seq[Column] = Seq(
    regexp_extract(part(line, 1), "^CEF:(\\d+)$", 1).cast("long").as("cef_version"),
    part(line, 2).as("device_vendor"),
    part(line, 3).as("device_product"),
    part(line, 4).as("device_version"),
    part(line, 5).as("signature_id"),
    part(line, 6).as("name"),
    part(line, 7).as("severity"))

  /** Everything after the 7th unescaped pipe = the extension string. */
  def extensionString(line: Column): Column =
    regexp_extract(line, "^(?:[^|]*\\|){7}(.*)$", 1)

  /** Extension `key=value` pairs as `map<string,string>` (value runs to the
    * next space; empty extension → empty map).
    */
  def extensions(line: Column): Column = kvMap(extensionString(line), " ")

  /** key=value map over `delim`-separated pairs. */
  private[formats] def kvMap(s: Column, delim: String): Column = {
    val d = java.util.regex.Pattern.quote(delim)
    val pairRe = s"([\\w.]+)=([^$d]*)"
    map_from_arrays(
      regexp_extract_all(s, lit(pairRe), lit(1)),
      regexp_extract_all(s, lit(pairRe), lit(2)))
  }

  /** Flat (header + exploded key/value) shape for oracle comparison. */
  def exploded(df: DataFrame, lineCol: String): DataFrame =
    df.select((col("*") +: headerColumns(col(lineCol))): _*)
      .withColumn("__kv", explode(map_entries(extensions(col(lineCol)))))
      .withColumn("ext_key", col("__kv.key"))
      .withColumn("ext_value", col("__kv.value"))
      .drop("__kv")

  /** Printer: header fields + extension map → one CEF line (`write_cef`).
    * Pipes and backslashes in header fields are escaped per the spec.
    */
  def printLine(version: Column, vendor: Column, product: Column,
      deviceVersion: Column, signatureId: Column, name: Column,
      severity: Column, ext: Column): Column = {
    def esc(c: Column): Column =
      regexp_replace(regexp_replace(c, "\\\\", "\\\\\\\\"), "\\|", "\\\\|")
    val extStr = array_join(
      transform(map_entries(ext), e => concat(e.getField("key"), lit("="), e.getField("value"))),
      " ")
    concat_ws("|", concat(lit("CEF:"), version.cast("string")),
      esc(vendor), esc(product), esc(deviceVersion), esc(signatureId), esc(name),
      severity.cast("string"), extStr)
  }
}

/** LEEF 1.0 / 2.0 parser. */
object Leef {

  private def part(line: Column, i: Int): Column = split_part(line, lit("|"), lit(i))

  def versionCol(line: Column): Column =
    regexp_extract(part(line, 1), "^LEEF:(.+)$", 1).as("leef_version")

  def headerColumns(line: Column): Seq[Column] = Seq(
    versionCol(line),
    part(line, 2).as("vendor"),
    part(line, 3).as("product_name"),
    part(line, 4).as("product_version"),
    // "leef_" prefix: the payload being parsed routinely rides NEXT TO an
    // envelope that already has an event_id column
    part(line, 5).as("leef_event_id"))

  /** The attribute blob: field 6 for LEEF 1.0, field 7 for LEEF 2.0 (field 6
    * is then the delimiter spec, e.g. `x09`). The delimiter field is NOT
    * optional in 2.0: the reference rejects 2.0 events without it
    * (`leef.cpp:209-224` fixes num_fields=6 and warns on an empty delimiter),
    * and this parser follows that contract.
    */
  def attributeString(line: Column): Column =
    when(versionCol(line).startsWith("1"),
      regexp_extract(line, "^(?:[^|]*\\|){5}(.*)$", 1))
      .otherwise(regexp_extract(line, "^(?:[^|]*\\|){6}(.*)$", 1))

  /** LEEF 2.0 delimiter spec → the literal delimiter (supports `xHH`/`0xHH`
    * hex and single chars; empty/1.0 → tab). Driver-side helper for building
    * the parse plan when the delimiter is known per-feed (the common case —
    * reference `leef.cpp:92-135` parses it per event, but a Spark plan is
    * compiled per feed).
    */
  def parseDelimiter(spec: String): String = spec match {
    case "" => "\t"
    case s if s.startsWith("0x") || s.startsWith("x") =>
      val hex = s.stripPrefix("0").stripPrefix("x")
      require(hex.length == 2, s"bad LEEF hex delimiter: $spec")
      Integer.parseInt(hex, 16).toChar.toString
    case s if s.length == 1 => s
    case other => sys.error(s"bad LEEF delimiter: $other")
  }

  /** Attributes as `map<string,string>` with a per-feed delimiter. */
  def attributes(line: Column, delim: String = "\t"): Column =
    Cef.kvMap(attributeString(line), delim)

  /** Flat (header + exploded key/value) shape for oracle comparison. */
  def exploded(df: DataFrame, lineCol: String, delim: String = "\t"): DataFrame =
    df.select((col("*") +: headerColumns(col(lineCol))): _*)
      .withColumn("__kv", explode(map_entries(attributes(col(lineCol), delim))))
      .withColumn("attr_key", col("__kv.key"))
      .withColumn("attr_value", col("__kv.value"))
      .drop("__kv")
}
