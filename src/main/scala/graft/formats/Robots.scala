package graft.formats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** robots.txt parsing — the crawl-politeness surface every web-corpus
  * pipeline consults before fetching (RFC 9309). The reference parses
  * security formats, not crawl formats (`/root/reference/libtenzir/builtins/
  * formats/` has syslog/cef/leef but no robots); this is part of the
  * webtext-axis extension set, same tier as [[Warc]].
  *
  * Semantics (RFC 9309 §2.2): a GROUP is one-or-more consecutive
  * `User-agent` lines followed by rules; every rule binds to ALL agents of
  * its group; a `User-agent` line after a rule line starts a NEW group.
  * Comments (`#` to end of line) are stripped anywhere; blank/garbage lines
  * are ignored (they do NOT break groups); `Sitemap` is global (RFC 9309
  * §2.3's "other records" — emitted with a null agent).
  *
  * Plan shape: per-document line explode → two per-doc window passes (lag
  * for group starts, running sum for group ids — both partitioned by doc,
  * parallel in documents) → one rules⋈agents join on (doc, group). No UDFs;
  * the field/value split is two regexes.
  */
object Robots {

  /** Parse a robots.txt text column into one row per (agent, rule).
    *
    * @return (idCol, agent, rule, value, line_no) — `rule` is the lowercased
    *         field name (`allow` / `disallow` / `crawl-delay` / `sitemap`);
    *         `agent` is null for global `sitemap` rows; `line_no` is the
    *         rule's 0-based line for deterministic ordering. Rules appearing
    *         before any `User-agent` line are dropped (RFC: rules outside a
    *         group are invalid).
    */
  def parse(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val raw = df.select(col(idCol),
      posexplode(split(col(textCol), "\n", -1)).as(Seq("line_no", "__raw")))
    // strip comments, trim; parse "Field: value"
    val stripped = trim(regexp_replace(col("__raw"), "#.*$", ""))
    val parsed = raw
      .withColumn("__ln", stripped)
      .withColumn("field", lower(regexp_extract(col("__ln"), "^([A-Za-z-]+)\\s*:", 1)))
      .withColumn("value", trim(regexp_extract(col("__ln"), "^[A-Za-z-]+\\s*:\\s*(.*)$", 1)))
      .filter(col("field").isin("user-agent", "allow", "disallow", "crawl-delay", "sitemap"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("line_no"))
    val isUa = col("field") === "user-agent"
    // Group membership is computed over GROUP lines only (user-agent + rules):
    // RFC 9309 §2.2.1 says other records (Sitemap) "MUST NOT interfere" —
    // a Sitemap line between stacked User-agent lines must not split them.
    val groupable = parsed.filter(col("field") =!= "sitemap")
    // a group starts at a user-agent line whose previous GROUP line was not one
    val grouped = groupable
      .withColumn("__start",
        when(isUa && coalesce(lag(isUa, 1).over(w), lit(false)) === false, 1L)
          .otherwise(0L))
      .withColumn("group_id", sum(col("__start")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val agents = grouped.filter(isUa)
      .select(col(idCol), col("group_id"), col("value").as("agent"))
    val rules = grouped
      .filter(col("field").isin("allow", "disallow", "crawl-delay") && col("group_id") > 0)
      .select(col(idCol), col("group_id"), col("field").as("rule"),
        col("value"), col("line_no").cast("long").as("line_no"))
    val bound = rules.join(agents, Seq(idCol, "group_id"))
      .select(col(idCol), col("agent"), col("rule"), col("value"), col("line_no"))
    val sitemaps = parsed.filter(col("field") === "sitemap")
      .select(col(idCol), lit(null).cast("string").as("agent"),
        lit("sitemap").as("rule"), col("value"), col("line_no").cast("long").as("line_no"))
    bound.unionByName(sitemaps)
  }

  /** Does `agent` fetching `path` pass this rule set? Longest-match wins
    * (RFC 9309 §2.2.2, specificity = octet length of the pattern), allow wins
    * ties; no matching rule → allowed. Patterns support the §2.2.3 special
    * characters: `*` matches any byte sequence, a trailing `$` anchors the
    * end of the path (a non-trailing `$` is literal, per the RFC's ABNF).
    * A pure Column fold over the doc's (rule, value) rows pre-collected per
    * agent — convenience for spot checks; bulk filtering should join on
    * prefix buckets.
    */
  def isAllowed(rules: Column, path: Column): Column = {
    // rules: array<struct<rule:string, value:string>> for ONE (doc, agent)
    val best = aggregate(rules,
      struct(lit(-1).as("len"), lit(true).as("allow")),
      (acc, r) => {
        val v = r.getField("value")
        val anchored = endswith(v, lit("$"))
        val pat = when(anchored, v.substr(lit(1), length(v) - 1)).otherwise(v)
        // escape regex metachars, then turn the RFC's `*` into `.*`
        val rx = concat(
          lit("^"),
          regexp_replace(
            regexp_replace(pat, "([\\\\.\\[\\]{}()+\\-?^$|])", "\\\\$1"),
            "\\*", ".*"),
          when(anchored, lit("$")).otherwise(lit("")))
        val matches = v =!= "" && regexp_like(path, rx)
        val longer = matches && length(v) > acc.getField("len")
        val tieAllow = matches && length(v) === acc.getField("len") &&
          r.getField("rule") === "allow"
        when(longer || tieAllow,
          struct(length(v).as("len"),
            (r.getField("rule") === "allow").as("allow")))
          .otherwise(acc)
      })
    best.getField("allow")
  }
}
