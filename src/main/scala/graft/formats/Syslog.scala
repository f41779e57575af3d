package graft.formats

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** RFC 5424 syslog parser as pure Catalyst column logic (no UDFs), including
  * STRUCTURED-DATA.
  *
  * Reference: `/root/reference/libtenzir/builtins/formats/syslog.cpp:677`
  * (new-RFC parse path: PRI, VERSION, TIMESTAMP, HOSTNAME, APP-NAME, PROCID,
  * MSGID, SD, MSG; nil values as `-`; SD params unescaped for `\"` `\\`
  * `\]`).
  *
  * Regexes are RE2-compatible (no lookaround), so a DuckDB oracle can run
  * the identical extraction.
  */
object Syslog5424 {

  /** `<PRI>VERSION TS HOST APP PROCID MSGID SD [MSG]` */
  val LineRegex: String =
    """^<(\d{1,3})>(\d{1,2}) (\S+) (\S+) (\S+) (\S+) (\S+) (-|(?:\[[^\]\\]*(?:\\.[^\]\\]*)*\])+)(?: (.*))?$"""

  /** One SD element `[id k="v" ...]` (group 1 = element content). */
  val SdElementRegex: String = """\[([^\]\\]*(?:\\.[^\]\\]*)*)\]"""

  /** One SD param `k="v"` (group 1 = key, group 2 = raw value). */
  val SdParamRegex: String = """([\w.@-]+)="([^"\\]*(?:\\.[^"\\]*)*)""""

  private def grp(line: Column, i: Int): Column = {
    val v = regexp_extract(line, LineRegex, i)
    when(line.rlike(LineRegex), v)
  }

  private def nilToNull(c: Column): Column = when(c === "-", lit(null)).otherwise(c)

  /** Unescape SD param values: `\"` → `"`, `\\` → `\`, `\]` → `]`. */
  def unescapeSd(v: Column): Column = regexp_replace(v, """\\([\\"\]])""", "$1")

  /** Header + message columns: facility, severity, version, ts, hostname,
    * app_name, proc_id, msg_id, message (nil `-` → null; ts as timestamp_ntz
    * to stay naive like the rest of the engine).
    */
  def headerColumns(line: Column): Seq[Column] = {
    val pri = grp(line, 1).cast("long")
    Seq(
      (pri / 8).cast("long").as("facility"),
      pmod(pri, lit(8)).cast("long").as("severity"),
      grp(line, 2).cast("long").as("version"),
      nilToNull(grp(line, 3)).cast("timestamp_ntz").as("ts"),
      nilToNull(grp(line, 4)).as("hostname"),
      nilToNull(grp(line, 5)).as("app_name"),
      nilToNull(grp(line, 6)).as("proc_id"),
      nilToNull(grp(line, 7)).as("msg_id"),
      nilToNull(grp(line, 9)).as("message"))
  }

  /** STRUCTURED-DATA as `map<sd_id, map<param, value>>` — the nested-record
    * shape the reference emits, built entirely from `regexp_extract_all` +
    * `map_from_arrays`.
    */
  def structuredData(line: Column): Column = {
    val sdRaw = nilToNull(grp(line, 8))
    val elements = regexp_extract_all(sdRaw, lit(SdElementRegex), lit(1))
    map_from_arrays(
      transform(elements, e => regexp_extract(e, """^(\S+)""", 1)),
      transform(elements, e =>
        map_from_arrays(
          regexp_extract_all(e, lit(SdParamRegex), lit(1)),
          transform(regexp_extract_all(e, lit(SdParamRegex), lit(2)), unescapeSd(_)))))
  }

  /** Printer: header fields + SD map → one RFC 5424 line (`write_syslog`).
    * Nulls print as `-`; SD param values escape `\` `"` `]`.
    */
  def printLine(facility: Column, severity: Column, ts: Column, hostname: Column,
      appName: Column, procId: Column, msgId: Column, sd: Column,
      message: Column): Column = {
    def nil(c: Column): Column = coalesce(c.cast("string"), lit("-"))
    val escV = (v: Column) => regexp_replace(v, """([\\"\]])""", """\\$1""")
    val sdStr = when(sd.isNull || size(map_keys(sd)) === 0, lit("-")).otherwise(
      array_join(transform(map_entries(sd), e =>
        concat(lit("["), e.getField("key"),
          when(size(map_keys(e.getField("value"))) > 0, concat(lit(" "),
            array_join(transform(map_entries(e.getField("value")), p =>
              concat(p.getField("key"), lit("=\""), escV(p.getField("value")), lit("\""))), " ")))
            .otherwise(lit("")),
          lit("]"))), ""))
    concat(
      lit("<"), (facility * 8 + severity).cast("string"), lit(">1 "),
      nil(date_format(ts, "yyyy-MM-dd'T'HH:mm:ss")), lit(" "),
      nil(hostname), lit(" "), nil(appName), lit(" "), nil(procId), lit(" "),
      nil(msgId), lit(" "), sdStr,
      when(message.isNotNull, concat(lit(" "), message)).otherwise(lit("")))
  }

  /** SD exploded to one row per (sd_id, param, value) triple — the
    * flat/orderable shape used by the oracle compare.
    */
  def sdExploded(df: org.apache.spark.sql.DataFrame, lineCol: String): org.apache.spark.sql.DataFrame = {
    val elements = regexp_extract_all(nilToNull(grp(col(lineCol), 8)), lit(SdElementRegex), lit(1))
    df.withColumn("__el", explode(elements))
      .withColumn("sd_id", regexp_extract(col("__el"), """^(\S+)""", 1))
      .select(col("*"),
        posexplode(arrays_zip(
          regexp_extract_all(col("__el"), lit(SdParamRegex), lit(1)),
          transform(regexp_extract_all(col("__el"), lit(SdParamRegex), lit(2)), unescapeSd(_))))
          .as(Seq("__i", "__kv")))
      .withColumn("sd_key", col("__kv.0"))
      .withColumn("sd_value", col("__kv.1"))
      .drop("__el", "__i", "__kv")
  }
}
