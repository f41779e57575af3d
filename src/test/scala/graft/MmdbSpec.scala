package graft

import org.apache.spark.sql.functions._

import graft.ops.Contexts
import graft.sources.Mmdb

/** MaxMind DB reader against synthesized spec-conformant images: range
  * extraction, nesting (most-specific wins), v6 trees with the IPv4-mapped
  * subtree, value flattening, and the end-to-end enrichRange probe.
  */
class MmdbSpec extends SparkSpec {

  private def ip(s: String): Long =
    s.split('.').map(_.toLong).reduce((a, b) => (a << 8) | b)

  test("disjoint CIDRs round-trip to one merged range each") {
    val bytes = Mmdb.encode(Seq(
      "10.0.0.0/8" -> Map("country" -> "AA"),
      "192.168.0.0/16" -> Map("country" -> "CC", "city" -> "x")))
    val ranges = Mmdb.parseRanges(bytes)
    assert(ranges == Seq(
      Mmdb.IpRange(ip("10.0.0.0"), ip("10.255.255.255"), Map("country" -> "AA")),
      Mmdb.IpRange(ip("192.168.0.0"), ip("192.168.255.255"),
        Map("country" -> "CC", "city" -> "x"))))
  }

  test("nested CIDRs: the covering leaf splits, most-specific wins, rest merges back") {
    val bytes = Mmdb.encode(Seq(
      "10.0.0.0/8" -> Map("c" -> "outer"),
      "10.128.0.0/16" -> Map("c" -> "inner")))
    val ranges = Mmdb.parseRanges(bytes)
    // disjoint, sorted, covering exactly the /8, with the /16 carved out
    assert(ranges.map(r => (r.lo, r.hi)).sliding(2).forall {
      case Seq((_, h1), (l2, _)) => h1 < l2; case _ => true })
    assert(ranges.head.lo == ip("10.0.0.0") && ranges.last.hi == ip("10.255.255.255"))
    val at = (x: String) => ranges.find(r => r.lo <= ip(x) && ip(x) <= r.hi).map(_.values("c"))
    assert(at("10.1.2.3").contains("outer"))
    assert(at("10.128.200.1").contains("inner"))
    assert(at("10.129.0.0").contains("outer"))
    assert(at("11.0.0.0").isEmpty)
    // the split-and-merge leaves the minimal piece count: below + inner + above
    assert(ranges == Seq(
      Mmdb.IpRange(ip("10.0.0.0"), ip("10.127.255.255"), Map("c" -> "outer")),
      Mmdb.IpRange(ip("10.128.0.0"), ip("10.128.255.255"), Map("c" -> "inner")),
      Mmdb.IpRange(ip("10.129.0.0"), ip("10.255.255.255"), Map("c" -> "outer"))))
  }

  test("ip_version=6 image: the v4 tree sits under 96 zero bits") {
    val bytes = Mmdb.encode(Seq(
      "203.0.113.0/24" -> Map("country" -> "DD")), ipVersion = 6)
    val ranges = Mmdb.parseRanges(bytes)
    assert(ranges == Seq(
      Mmdb.IpRange(ip("203.0.113.0"), ip("203.0.113.255"), Map("country" -> "DD"))))
  }

  test("readRanges + enrichRange: the full geoip probe over a tmp .mmdb file") {
    val dir = tmpDir()
    val path = s"$dir/test.mmdb"
    java.nio.file.Files.write(java.nio.file.Paths.get(path), Mmdb.encode(Seq(
      "10.0.0.0/8" -> Map("country" -> "AA"),
      "192.168.0.0/16" -> Map("country" -> "CC"))))
    val ctx = Mmdb.readRanges(spark, path)
    assert(ctx.columns.toSeq == Seq("range_lo", "range_hi", "country"))
    val sess = spark
    import sess.implicits._
    val events = Seq(
      (1L, ip("10.3.4.5")), (2L, ip("192.168.1.1")), (3L, ip("8.8.8.8")))
      .toDF("id", "ipn")
    val got = Contexts.enrichRange(events, col("ipn"), ctx)
      .select("id", "country").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "AA", 2L -> "CC", 3L -> null))
  }
}
