package graft.formats

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.Web

/** CDXJ web-archive index lines — the Common-Crawl/pywb URL-index format:
  * `<surt-urlkey> <14-digit-timestamp> {"url": …, "status": …, …}`. The
  * crawl-side companion of [[Warc]]: a CDX index is how 100 TB of WARC is
  * randomly accessed (urlkey prefix scan → filename/offset/length), so a
  * webtext pipeline both PRINTS these (indexing a crawl) and PARSES them
  * (joining an index against WARC payloads). Reference has no CDX surface;
  * built like the other line formats — pure Column regex/string ops in the
  * Java∩RE2 subset so the DuckDB oracle runs identical expressions, zero
  * shuffle either direction.
  */
object Cdx {

  private def jfield(line: Column, name: String): Column =
    regexp_extract(line, "\"" + name + "\": \"([^\"]*)\"", 1)

  /** Parse a CDXJ line into
    * struct(urlkey, ts (timestamp_ntz), url, status (int), mime, digest,
    * length (long), offset (long), filename) — absent JSON fields → null.
    */
  def parseCdxj(line: Column): Column = {
    def opt(c: Column): Column = when(c === "", lit(null)).otherwise(c)
    struct(
      regexp_extract(line, "^(\\S+)", 1).as("urlkey"),
      to_timestamp(regexp_extract(line, "^\\S+ (\\d{14})", 1),
        "yyyyMMddHHmmss").cast("timestamp_ntz").as("ts"),
      opt(jfield(line, "url")).as("url"),
      opt(jfield(line, "status")).cast("int").as("status"),
      opt(jfield(line, "mime")).as("mime"),
      opt(jfield(line, "digest")).as("digest"),
      opt(jfield(line, "length")).cast("long").as("length"),
      opt(jfield(line, "offset")).cast("long").as("offset"),
      opt(jfield(line, "filename")).as("filename"))
  }

  /** Print a CDXJ line: the urlkey is derived from `url` via
    * [[Web.surtKey]]; `ts` must be a 14-digit `yyyyMMddHHmmss` string (use
    * `date_format(ts, "yyyyMMddHHmmss")` for timestamp columns).
    */
  def printCdxj(url: Column, ts14: Column, status: Column, mime: Column,
      digest: Column, length: Column, offset: Column,
      filename: Column): Column =
    concat(
      Web.surtKey(url), lit(" "), ts14,
      lit(" {\"url\": \""), url,
      lit("\", \"mime\": \""), mime,
      lit("\", \"status\": \""), status.cast("string"),
      lit("\", \"digest\": \""), digest,
      lit("\", \"length\": \""), length.cast("string"),
      lit("\", \"offset\": \""), offset.cast("string"),
      lit("\", \"filename\": \""), filename,
      lit("\"}"))
}
