package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.ops.Contexts

/** The reference's IP/subnet scalar-function surface (SURVEY.md §2.4:
  * `libtenzir/builtins/functions/ip.cpp`, `subnet.cpp`, `community_id.cpp`)
  * as pure Column compositions over dotted-quad IPv4 strings — no UDT, no
  * UDF, everything codegen'd.
  */
object Ip {

  /** Dotted-quad → numeric (re-export of the context helper). */
  def ipToLong(ip: Column): Column = Contexts.ipToLong(ip)

  /** Numeric → dotted-quad (re-export). */
  def numToDotted(n: Column): Column = graft.ops.Privacy.numToDotted(n)

  /** `is_v4` — syntactic IPv4 check (reference `ip.cpp` type predicate). */
  def isV4(ip: Column): Column =
    ip.rlike("^(25[0-5]|2[0-4][0-9]|1?[0-9]?[0-9])(\\.(25[0-5]|2[0-4][0-9]|1?[0-9]?[0-9])){3}$")

  /** `network(subnet)` — the network address of `ip` under a prefix length
    * (reference `subnet.cpp` `network()` member).
    */
  def network(ip: Column, prefixLen: Column): Column = {
    val mask = when(prefixLen === 0, 0L)
      .otherwise(bitwise_not(call_function("shiftleft", lit(1L), (lit(32) - prefixLen).cast("int")) - 1L)
        .bitwiseAND(lit(0xFFFFFFFFL)))
    numToDotted(ipToLong(ip).bitwiseAND(mask))
  }

  /** [[ipToLong]] that yields null (not an ANSI cast error) on strings that
    * are not dotted-quad IPv4 — `when` branches evaluate lazily, so the cast
    * never sees malformed input.
    */
  def safeIpToLong(ip: Column): Column = when(isV4(ip), Contexts.ipToLong(ip))

  /** `subnet contains ip` — CIDR membership (reference `subnet.cpp`
    * containment operator). `cidr` is a "a.b.c.d/len" string column; a
    * malformed `ip` yields null.
    */
  def cidrContains(cidr: Column, ip: Column): Column = {
    val len = split_part(cidr, lit("/"), lit(2)).cast("int")
    val mask = when(len === 0, 0L)
      .otherwise(bitwise_not(call_function("shiftleft", lit(1L), (lit(32) - len).cast("int")) - 1L)
        .bitwiseAND(lit(0xFFFFFFFFL)))
    ipToLong(split_part(cidr, lit("/"), lit(1))).bitwiseAND(mask) ===
      safeIpToLong(ip).bitwiseAND(mask)
  }

  /** RFC1918 private-range check. */
  def isPrivate(ip: Column): Column =
    cidrContains(lit("10.0.0.0/8"), ip) ||
      cidrContains(lit("172.16.0.0/12"), ip) ||
      cidrContains(lit("192.168.0.0/16"), ip)

  /** Zeek Community ID v1 (reference
    * `libtenzir/builtins/functions/community_id.cpp`; public spec:
    * github.com/corelight/community-id-spec): `"1:" + base64(sha1(seed_be16 ||
    * saddr || daddr || proto || 0x00 || sport_be16 || dport_be16))` with the
    * endpoint pair ordered so the numerically smaller (addr, port) comes
    * first. IPv4 only (our string model); pure Column — sha1/base64/unhex are
    * all codegen'd builtins.
    */
  def communityId(saddr: Column, daddr: Column, sport: Column, dport: Column,
      proto: Column, seed: Int = 0): Column = {
    val (sa, da) = (ipToLong(saddr), ipToLong(daddr))
    val flip = sa > da || (sa === da && sport > dport)
    val (a1, p1) = (when(flip, da).otherwise(sa), when(flip, dport).otherwise(sport))
    val (a2, p2) = (when(flip, sa).otherwise(da), when(flip, sport).otherwise(dport))
    def be16(v: Column): Column = unhex(lpad(hex(v.cast("long")), 4, "0"))
    def be32(v: Column): Column = unhex(lpad(hex(v), 8, "0"))
    def byte1(v: Column): Column = unhex(lpad(hex(v.cast("long")), 2, "0"))
    val payload = concat(
      unhex(lpad(hex(lit(seed.toLong)), 4, "0")),
      be32(a1), be32(a2), byte1(proto), unhex(lit("00")), be16(p1), be16(p2))
    concat(lit("1:"), base64(unhex(sha1(payload))))
  }
}
