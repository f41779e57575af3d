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
    * segments: `..` pops a component, `.` collapses, anything else —
    * including empty segments, which §5.3 preserves ("/a//b" stays) —
    * appends). The leading pre-slash split artifact is dropped; a trailing
    * `/.` or `/..` keeps the directory form (`…/`), matching the RFC
    * reference algorithm (a plain trailing `/` survives naturally as a
    * preserved empty segment); `..` at the root is a no-op. Verified
    * against the full §5.4 example set plus empty-segment vectors in
    * WebSpec.
    */
  private[graft] def removeDotSegments(p: Column): Column = {
    val segs = split(p, "/")
    // drop split's first element — the input is an absolute path ("/…"),
    // so segs(0) is always the empty pre-slash piece, not a real segment
    val rest = slice(segs, lit(2), greatest(size(segs) - 1, lit(0)))
    val folded = aggregate(rest, lit(""),
      (acc: Column, s: Column) =>
        when(s === ".", acc)
          .when(s === "..", regexp_replace(acc, "/[^/]*$", ""))
          .otherwise(concat(acc, lit("/"), s)))
    val dirForm = p.rlike("(/\\.|/\\.\\.)$")
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
    // network-path reference (§5.2.2): new authority from the href, base
    // scheme, and — like every other relative form — dot segments removed
    // from the href's own path (empty path stays empty: "//g" → "scheme://g")
    val netAuth = regexp_extract(noFrag, "^(//[^/?#]*)", 1)
    val netPath = regexp_extract(noFrag, "^//[^/?#]*([^?#]*)", 1)
    when(noFrag === "", concat(scheme, authority, basePath0,
        regexp_extract(base, "(\\?[^#]*)", 1)))
      .when(noFrag.rlike("^[A-Za-z][A-Za-z0-9+.-]*:"), noFrag)
      .when(noFrag.startsWith("//"),
        concat(scheme, lit(":"), netAuth,
          when(netPath === "", lit("")).otherwise(removeDotSegments(netPath)),
          hQuery))
      // query-only href keeps the base path VERBATIM (§5.2.2: T.path =
      // Base.path) — an empty base path stays empty, same as the
      // empty-href branch above
      .when(noFrag.startsWith("?"), concat(scheme, authority, basePath0, noFrag))
      .when(noFrag.startsWith("/"),
        concat(scheme, authority, removeDotSegments(hPath), hQuery))
      .otherwise(
        concat(scheme, authority,
          removeDotSegments(concat(baseDir, hPath)), hQuery))
  }

  /** SURT key (Sort-friendly URI Reordering Transform) — the canonical form
    * web-archive CDX indexes sort and prefix-scan by (Heritrix/Common-Crawl
    * `urlkey` convention): host lowercased, a leading `www.` stripped,
    * labels REVERSED and comma-joined, then `)`, the lowercased path (`/`
    * when absent), and the query with its params SORTED (so equivalent
    * urls with permuted params collide). Prefix-scanning `com,example)`
    * yields a whole domain — the property that makes the key the right
    * range-partitioning key for crawl indexes at scale.
    */
  def surtKey(u: Column): Column = {
    val host = regexp_replace(urlHost(u), "^www\\.", "")
    val rev = array_join(reverse(split(host, "\\.")), ",")
    // non-default explicit ports stay in the key (surt convention
    // `net,example:8080)`): distinct origins must not collide onto one
    // urlkey. Scheme-default ports (http:80, https:443) are dropped — the
    // same origin with and without them IS one origin.
    val scheme = urlScheme(u)
    val port = urlPort(u)
    val isDefault = (scheme === "http" && port === 80L) ||
      (scheme === "https" && port === 443L)
    val portPart = when(port.isNull || isDefault, lit(""))
      .otherwise(concat(lit(":"), port.cast("string")))
    val path = lower(urlPath(u))
    val q = lower(urlQuery(u))
    val qPart = when(q === "", lit(""))
      .otherwise(concat(lit("?"), array_join(array_sort(split(q, "&")), "&")))
    concat(rev, portPart, lit(")"),
      when(path === "", lit("/")).otherwise(path), qPart)
  }

  /** HTML entity decode for attribute values — the five XML built-ins plus
    * `&#39;`, `&amp;` last so `&amp;lt;` does not double-decode (same
    * ordering as `Text.extractText` / `Sitemap.entityDecode`).
    */
  private def entityDecode(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(c, "&lt;", "<"),
            "&gt;", ">"),
          "&quot;", "\""),
        "&#39;", "'"),
      "&amp;", "&")

  /** Extract `<a href=…>anchor</a>` pairs from an HTML string as
    * `array<struct<href:string, anchor:string>>` — the link-graph edge
    * emitter ([[graft.ops.Rank.pagerank]] consumes the resolved edges).
    *
    * `href` must be a real attribute (whitespace-preceded, so `data-href`
    * never matches) and may be double-quoted, single-quoted, or unquoted —
    * all three are valid HTML and common in crawl data. Values are
    * entity-decoded (`&amp;` is the REQUIRED encoding of `&` in valid HTML
    * attributes, so `?a=1&amp;b=2` must resolve to `?a=1&b=2`). Anchors are
    * tag-stripped and whitespace-collapsed. The regex stays in the Java∩RE2
    * subset (lazy quantifiers, no backreferences or lookaround) so the
    * DuckDB oracle can run the identical pattern.
    */
  def extractLinks(html: Column): Column = {
    // `<a(?:\s[^>]*?)?\shref` — href needs whitespace immediately before it,
    // either the one after `<a` or one inside the attribute run; `data-href`
    // has `-` there and cannot match
    val pat = "(?is)<a(?:\\s[^>]*?)?\\shref\\s*=\\s*" +
      "(\"[^\"]*\"|'[^']*'|[^\\s>]+)[^>]*>(.*?)</a>"
    val hrefs = transform(regexp_extract_all(html, lit(pat), lit(1)),
      h => entityDecode(
        regexp_replace(h, "(?s)^\"(.*)\"$|(?s)^'(.*)'$", "$1$2")))
    val anchors = transform(regexp_extract_all(html, lit(pat), lit(2)),
      a => trim(regexp_replace(regexp_replace(a, "<[^>]*>", " "), "\\s+", " ")))
    zip_with(hrefs, anchors,
      (h, a) => struct(h.as("href"), a.as("anchor")))
  }
}
