package graft.formats

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** WARC (Web ARChive, ISO 28500) record framing and header parsing — the
  * container format of Common Crawl, i.e. the entry point of every web-text
  * training pipeline. The reference has no WARC parser (its web story stops
  * at HTTP/velociraptor connectors); this is a webtext-axis extension built
  * in the same style as its `parse_*` family (`read_syslog`, `read_cef`):
  * pure Column regex compositions, zero shuffle, one scan.
  *
  * [[records]] splits a concatenated-record blob on the `WARC/1.x` version
  * line (lookahead split — Java regex; record *parsing* stays in the
  * RE2-compatible subset so a DuckDB oracle can verify the fields). Note:
  * real WARC frames records by `Content-Length`; magic-line splitting is the
  * streaming-friendly approximation and assumes bodies don't embed a
  * line-initial `WARC/1.x` marker (true for header-only and text fixtures;
  * binary payloads should use a length-framed reader).
  */
object Warc {

  /** Split a blob of concatenated WARC records into an array of record
    * strings (the `WARC/1.x` version line starts each element).
    */
  def records(blob: Column): Column =
    filter(split(blob, "(?m)(?=^WARC/1\\.[01]\\r?\\n)", -1), r => r =!= "")

  /** Extract one named WARC header field (case-insensitive, first
    * line-initial match — anchored so `Content-Length` never matches inside
    * `X-Content-Length`). Callers should pass the header BLOCK (see
    * [[parse]]) so body lines can never masquerade as headers.
    */
  def field(rec: Column, name: String): Column = {
    val re = "(?mi)^" + java.util.regex.Pattern.quote(name) + ":[ \\t]*([^\\r\\n]+)"
    val v = regexp_extract(rec, re, 1)
    when(v =!= "", v)
  }

  /** The record body: everything after the first blank line. */
  def body(rec: Column): Column =
    when(rec.rlike("\\r\\n\\r\\n"), regexp_extract(rec, "(?s)\\r\\n\\r\\n(.*)$", 1))

  /** Standard header set as one struct:
    * `warc_type, record_id, target_uri, warc_date, content_type,
    * content_length, body`. Fields are extracted from the header block only
    * (everything before the first blank line — `substring_index`, no regex),
    * so a body line like `warc-type: x` can never shadow a missing header.
    */
  def parse(rec: Column): Column = {
    val hdr = substring_index(rec, "\r\n\r\n", 1)
    struct(
      field(hdr, "WARC-Type").as("warc_type"),
      field(hdr, "WARC-Record-ID").as("record_id"),
      field(hdr, "WARC-Target-URI").as("target_uri"),
      field(hdr, "WARC-Date").as("warc_date"),
      field(hdr, "Content-Type").as("content_type"),
      field(hdr, "Content-Length").cast("long").as("content_length"),
      body(rec).as("body"))
  }

  /** Print a WET-style `conversion` record (the WARC *text* sidecar format
    * Common Crawl ships as `.warc.wet.gz` — extracted plain text per page,
    * which is exactly what an LLM-data pipeline consumes). `Content-Length`
    * is the body's OCTET length (UTF-8 bytes, per ISO 28500), not its
    * character count. `date` must be an ISO-8601 `…Z` string; `recordId`
    * any RFC-2392-ish urn. Round-trips through [[records]]/[[parse]].
    */
  def printWet(targetUri: Column, date: Column, recordId: Column,
      text: Column): Column =
    concat(
      lit("WARC/1.0\r\n"),
      lit("WARC-Type: conversion\r\n"),
      lit("WARC-Target-URI: "), targetUri, lit("\r\n"),
      lit("WARC-Date: "), date, lit("\r\n"),
      lit("WARC-Record-ID: "), recordId, lit("\r\n"),
      lit("Content-Type: text/plain\r\n"),
      lit("Content-Length: "), octet_length(text).cast("string"),
      lit("\r\n\r\n"), text)
}
