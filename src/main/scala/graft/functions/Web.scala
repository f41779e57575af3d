package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization and decomposition for web-scale pipelines.
  *
  * The CDC north star keys every page by `url` (BASELINE.json input_hint);
  * any dedup/grouping over that key at 10^10-event scale wants a canonical
  * form first (scheme/host case, default ports, fragments) or hot keys split
  * across spellings of the same page. The reference has no URL module — this
  * is part of the training-data extension surface, alongside graft.ops.Dedup.
  *
  * All extraction is plain regexp over the RFC 3986 appendix-B grammar using
  * only character classes and non-capturing groups, so the identical pattern
  * runs in Java regex (Spark, codegen'd) and RE2 (DuckDB oracle) with the
  * same semantics. No-match yields the engines' shared "" convention, mapped
  * to null where a typed value (port) is expected.
  */
object Web {

  /** URI scheme, lowercased; "" when absent. */
  def urlScheme(u: Column): Column =
    lower(regexp_extract(u, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))

  /** Host, lowercased, userinfo and port stripped; "" when not a
    * scheme://host URL.
    */
  def urlHost(u: Column): Column =
    lower(regexp_extract(u, "^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]*)", 1))

  /** Explicit port as a long; null when absent. */
  def urlPort(u: Column): Column = {
    val p = regexp_extract(u, "^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?[^/?#:]*:([0-9]+)", 1)
    when(p === "", lit(null).cast("long")).otherwise(p.cast("long"))
  }

  /** Path starting at "/"; "" when the URL has no path component. */
  def urlPath(u: Column): Column =
    regexp_extract(u, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(/[^?#]*)", 1)

  /** Query string without the "?"; "" when absent. The "?" must precede any
    * "#" — a "?" inside the fragment is fragment text, not a query (the lazy
    * `[^#]*?` prefix cannot cross a "#").
    */
  def urlQuery(u: Column): Column =
    regexp_extract(u, "^[^#]*?\\?([^#]*)", 1)

  /** Fragment without the "#"; "" when absent. */
  def urlFragment(u: Column): Column =
    regexp_extract(u, "#(.*)$", 1)

  /** Value of one query parameter; "" when the key is absent. `key` must be
    * a plain literal name (it is embedded in the pattern unescaped).
    */
  def urlQueryParam(u: Column, key: String): Column =
    regexp_extract(urlQuery(u), s"(?:^|&)$key=([^&]*)", 1)

  /** Two-label public suffixes where the registrable domain is the last
    * THREE labels ("bbc.co.uk"), not two. A deliberately small, documented
    * subset of the public-suffix list — the full list is data, this is the
    * algorithm; swap the set for the real PSL in production.
    */
  val MultiPartSuffixes: Seq[String] = Seq(
    "co.uk", "ac.uk", "gov.uk", "org.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "com.tw", "co.in", "co.kr", "com.mx",
    "co.nz", "co.za", "com.sg", "com.ar", "com.tr", "co.id")

  /** Registrable ("pay-level") domain of a host: last two labels, or last
    * three when the last two are a multi-part public suffix. Hosts with
    * fewer labels pass through unchanged. The host is lowercased first
    * (hosts are case-insensitive per RFC 4343; the suffix set is lowercase).
    */
  def registeredDomain(host: Column): Column = {
    val h = lower(host)
    val labels = split(h, "\\.")
    val n = size(labels)
    val last2 = concat_ws(".", slice(labels, -2, 2))
    val take = when(last2.isin(MultiPartSuffixes: _*) && n >= lit(3), lit(3)).otherwise(lit(2))
    when(n <= 2, h).otherwise(concat_ws(".", slice(labels, (take * -1), take)))
  }

  /** Canonical URL: scheme and host lowercased, userinfo dropped, default
    * port stripped (80 for http, 443 for https; other ports kept), empty
    * path becomes "/", query kept verbatim when nonempty, fragment dropped.
    * Non-URL strings (no scheme://) pass through unchanged so the function
    * is safe over dirty columns.
    */
  def urlNormalize(u: Column): Column = {
    val scheme = urlScheme(u)
    val host = urlHost(u)
    val port = urlPort(u)
    val isDefault = (scheme === "http" && port === 80L) ||
      (scheme === "https" && port === 443L)
    val portPart = when(port.isNull || isDefault, lit(""))
      .otherwise(concat(lit(":"), port.cast("string")))
    val path = urlPath(u)
    val pathPart = when(path === "", lit("/")).otherwise(path)
    val query = urlQuery(u)
    val queryPart = when(query === "", lit("")).otherwise(concat(lit("?"), query))
    when(scheme === "", u)
      .otherwise(concat(scheme, lit("://"), host, portPart, pathPart, queryPart))
  }

  /** RFC 3986 §5.3 remove_dot_segments over an absolute path, as a pure
    * Column fold (string accumulator — `aggregate` over the `/`-split
    * segments: `..` pops a component, `.` and empty segments collapse,
    * anything else appends). A trailing `/`, `/.` or `/..` keeps the
    * directory form (`…/`), matching the RFC reference algorithm; `..` at
    * the root is a no-op. Verified against the full §5.4 example set in
    * WebSpec.
    */
  private[graft] def removeDotSegments(p: Column): Column = {
    val folded = aggregate(split(p, "/"), lit(""),
      (acc: Column, s: Column) =>
        when(s === "" || s === ".", acc)
          .when(s === "..", regexp_replace(acc, "/[^/]*$", ""))
          .otherwise(concat(acc, lit("/"), s)))
    val dirForm = p.rlike("(/|/\\.|/\\.\\.)$")
    when(dirForm, concat(folded, lit("/")))
      .otherwise(when(folded === "", lit("/")).otherwise(folded))
  }

  /** Resolve an href against an absolute base URL — RFC 3986 §5.2 reference
    * resolution for the http(s) cases a crawler meets: absolute URIs pass
    * through (any scheme, incl. `mailto:`), protocol-relative (`//host/…`)
    * adopts the base scheme, root-relative and path-relative merge with the
    * base path and have dot segments removed, `?query` replaces the base
    * query, and an empty/fragment-only href yields the base. Fragments are
    * stripped throughout (a crawl frontier never keys on them).
    */
  def resolveUrl(base: Column, href: Column): Column = {
    val noFrag = regexp_replace(href, "#.*$", "")
    val scheme = regexp_extract(base, "^([A-Za-z][A-Za-z0-9+.-]*):", 1)
    val authority = regexp_extract(base, "^[A-Za-z][A-Za-z0-9+.-]*(://[^/?#]*)", 1)
    val basePath0 = regexp_extract(base, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val basePath = when(basePath0 === "", lit("/")).otherwise(basePath0)
    val baseDir = regexp_replace(basePath, "[^/]*$", "")
    val hPath = regexp_replace(noFrag, "\\?.*$", "")
    val hQuery = regexp_extract(noFrag, "(\\?[^#]*)", 1)
    when(noFrag === "", concat(scheme, authority, basePath0,
        regexp_extract(base, "(\\?[^#]*)", 1)))
      .when(noFrag.rlike("^[A-Za-z][A-Za-z0-9+.-]*:"), noFrag)
      .when(noFrag.startsWith("//"), concat(scheme, lit(":"), noFrag))
      .when(noFrag.startsWith("?"), concat(scheme, authority, basePath, noFrag))
      .when(noFrag.startsWith("/"),
        concat(scheme, authority, removeDotSegments(hPath), hQuery))
      .otherwise(
        concat(scheme, authority,
          removeDotSegments(concat(baseDir, hPath)), hQuery))
  }

  /** Extract `<a href="…">anchor</a>` pairs from an HTML string as
    * `array<struct<href:string, anchor:string>>` — the link-graph edge
    * emitter ([[graft.ops.Rank.pagerank]] consumes the resolved edges).
    * Anchors are tag-stripped and whitespace-collapsed; the regex stays in
    * the Java∩RE2 subset (lazy quantifiers, no backreferences) so the DuckDB
    * oracle runs the identical pattern.
    */
  def extractLinks(html: Column): Column = {
    val pat = "(?is)<a\\s[^>]*?href\\s*=\\s*\"([^\"]*)\"[^>]*>(.*?)</a>"
    val hrefs = regexp_extract_all(html, lit(pat), lit(1))
    val anchors = transform(regexp_extract_all(html, lit(pat), lit(2)),
      a => trim(regexp_replace(regexp_replace(a, "<[^>]*>", " "), "\\s+", " ")))
    zip_with(hrefs, anchors,
      (h, a) => struct(h.as("href"), a.as("anchor")))
  }
}
