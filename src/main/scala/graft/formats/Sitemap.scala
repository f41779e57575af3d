package graft.formats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** sitemaps.org XML parsing — the discovery-side companion of [[Robots]]
  * (robots.txt points at sitemaps; a crawl frontier seeds from them). The
  * reference has no sitemap surface; this is webtext-axis extension built
  * like the other `parse_*` formats: pure Column regexes in the Java∩RE2
  * subset so the DuckDB oracle can run the identical patterns, zero shuffle.
  *
  * Both document kinds are handled: `<urlset>` (leaf sitemaps, `<url>`
  * entries) and `<sitemapindex>` (index files, `<sitemap>` entries pointing
  * at child sitemaps). Entity-decoding covers the five XML built-ins
  * (`&amp;` last — no double-decode, same ordering as `Text.extractText`).
  */
object Sitemap {

  private def entityDecode(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(c, "&lt;", "<"),
            "&gt;", ">"),
          "&quot;", "\""),
        "&apos;", "'"),
      "&amp;", "&")

  /** One child element's text, trimmed + entity-decoded; null when absent. */
  private def elem(block: Column, name: String): Column = {
    val v = trim(regexp_extract(block, s"(?is)<$name>(.*?)</$name>", 1))
    when(v =!= "", entityDecode(v))
  }

  /** Parse a sitemap XML column into one row per entry.
    *
    * @return (idCol, entry_no, is_index, loc, lastmod, changefreq, priority)
    *         — `is_index` is true when the document is a `<sitemapindex>`
    *         (entries are then child-sitemap locations; changefreq/priority
    *         are null by schema); `entry_no` is the 0-based entry position;
    *         entries with no `<loc>` are dropped (the spec requires one).
    */
  def parse(df: DataFrame, xmlCol: String, idCol: String): DataFrame = {
    val isIndex = col(xmlCol).rlike("(?is)<sitemapindex[\\s>]")
    val blockRe = when(isIndex, lit("(?is)<sitemap>(.*?)</sitemap>"))
      .otherwise(lit("(?is)<url>(.*?)</url>"))
    df.select(col(idCol), isIndex.as("is_index"),
        posexplode(regexp_extract_all(col(xmlCol), blockRe, lit(1)))
          .as(Seq("entry_no", "__b")))
      .withColumn("loc", elem(col("__b"), "loc"))
      .withColumn("lastmod", elem(col("__b"), "lastmod"))
      .withColumn("changefreq", elem(col("__b"), "changefreq"))
      .withColumn("priority", elem(col("__b"), "priority").cast("double"))
      .filter(col("loc").isNotNull)
      .select(col(idCol), col("entry_no").cast("long").as("entry_no"),
        col("is_index"), col("loc"), col("lastmod"), col("changefreq"),
        col("priority"))
  }
}
