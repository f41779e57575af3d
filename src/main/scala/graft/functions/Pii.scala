package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction — the standard pre-training hygiene pass
  * (emails, IPv4 addresses, US-style SSNs, phone numbers) the reference's
  * pipeline leaves to downstream consumers (its `pseudonymize` covers only
  * IP columns; cf. `tenzir/web/docs/tql2/operators/pseudonymize.md`).
  *
  * Everything is a pure codegen'd Column composition (`regexp_count` /
  * chained `regexp_replace`) — zero shuffle, scales linearly with the scan.
  * The regexes deliberately stay inside the syntax subset Java regex and
  * RE2 (DuckDB) interpret identically — character classes, bounded
  * repetition, `(?:…)`, `\b` — so the oracle recomputes exact matches; no
  * lookaround, no backreferences.
  */
object Pii {

  /** RFC-5322-ish practical email matcher. */
  val emailRe = "[A-Za-z0-9._%+\\-]+@[A-Za-z0-9.\\-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4 (no octet-range check — redaction wants recall). */
  val ipv4Re = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"

  /** US SSN: ddd-dd-dddd with word boundaries. */
  val ssnRe = "\\b\\d{3}-\\d{2}-\\d{4}\\b"

  /** Phone: optional +CC, then ddd[ -]ddd(d)[ -]dddd. Deliberately shaped so
    * it cannot half-match an SSN (middle group is 3-4 digits, SSN's is 2).
    */
  val phoneRe = "(?:\\+\\d{1,2}[ \\-])?\\b\\d{3}[ \\-]\\d{3,4}[ \\-]\\d{4}\\b"

  def countEmails(text: Column): Column = regexp_count(text, lit(emailRe))
  def countIpv4(text: Column): Column = regexp_count(text, lit(ipv4Re))
  def countSsn(text: Column): Column = regexp_count(text, lit(ssnRe))
  def countPhones(text: Column): Column = regexp_count(text, lit(phoneRe))

  /** Replace every PII span with a typed token. Fixed application order
    * (EMAIL → SSN → IPV4 → PHONE) so later passes cannot re-match inside an
    * earlier redaction, and the oracle applies the identical chain.
    */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(text, emailRe, "<EMAIL>"),
          ssnRe, "<SSN>"),
        ipv4Re, "<IP>"),
      phoneRe, "<PHONE>")

  /** True when any PII class matches — the filter predicate form. */
  def hasPii(text: Column): Column =
    countEmails(text) + countSsn(text) + countIpv4(text) + countPhones(text) > 0
}
