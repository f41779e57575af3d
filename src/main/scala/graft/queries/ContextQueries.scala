package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Ip
import graft.ops.{Contexts, Privacy}

/** Driver-checked query catalog, part 5: context enrichment — Bloom-filter
  * membership, TTL'd lookup tables, subnet longest-prefix matching,
  * geoip-style range contexts — plus the ip/subnet scalar-function module
  * and Crypto-PAn-structured pseudonymization. The Bloom filter and the
  * pseudonymizer are md5h60-based, so the DuckDB oracle reconstructs the
  * IDENTICAL filter (false positives included) and the identical 32-bit
  * prefix-preserving mapping.
  */
object ContextQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  private val M = 16384 // bloom bits
  private val PanKey = "graft-pan-key" // pseudonymization PRF key

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // membership context: build over customers, probe a hit/miss key mix
    "q_bloom" -> ((s, d) => {
      val bf = Contexts.bloomBuild(
        t(s, d, "customer"), concat(lit("c"), col("c_custkey").cast("string")), M)
      t(s, d, "orders")
        .withColumn("key",
          when(pmod(col("o_orderkey"), lit(3)) === 0,
            concat(lit("c"), col("o_custkey").cast("string")))
            .otherwise(concat(lit("x"), col("o_orderkey").cast("string"))))
        .select(col("o_orderkey"), col("key"), bf.mightContain(col("key")).as("might_contain"))
    }),

    // TTL'd lookup context: entries expire relative to the probing event's time
    "q_enrich_ttl" -> ((s, d) => {
      val ctx = t(s, d, "customer").select(
        col("c_custkey"),
        col("c_name"),
        expr("timestampadd(HOUR, CAST(c_custkey % 1000 AS INT), TIMESTAMP_NTZ '1995-01-01 00:00:00')")
          .as("created_ts"),
        expr("timestampadd(HOUR, CAST(c_custkey % 1000 AS INT) + 240, TIMESTAMP_NTZ '1995-01-01 00:00:00')")
          .as("updated_ts"))
      Contexts.enrichWithTtl(
        t(s, d, "orders").select(col("o_orderkey"), col("o_custkey").as("c_custkey"),
          col("o_orderdate")),
        ctx, Seq("c_custkey"), col("o_orderdate"),
        createTimeoutSec = Some(90L * 86400), updateTimeoutSec = Some(120L * 86400))
        .select("o_orderkey", "c_custkey", "c_name")
    }),

    // range-keyed context (the geoip shape: disjoint numeric ranges + values)
    "q_enrich_range" -> ((s, d) => {
      val sess = s
      import sess.implicits._
      val ctx = Seq(
        (0L, 999999999L, "apnic"),
        (1000000000L, 1999999999L, "ripe"),
        (2000000000L, 2999999999L, "arin"),
        (3000000000L, 4294967295L, "lacnic")).toDF("range_lo", "range_hi", "rir")
      val ev = t(s, d, "events").select(
        col("event_id"),
        pmod(col("event_id") * 2654435761L, lit(4294967296L)).as("ipn"))
      Contexts.enrichRange(ev, col("ipn"), ctx)
    }),

    // the FULL geoip path: a deterministic .mmdb image (binary search tree +
    // data section + metadata, MaxMind DB spec 2.0) is synthesized, parsed
    // back by the driver-side Mmdb reader into the range table, and probed
    // with the broadcast range join — same plan as q_enrich_range, with the
    // context coming from the real binary format (geoip.cpp analogue)
    "q_geoip" -> ((s, d) => {
      val nets = Seq(
        "10.0.0.0/8" -> Map("country" -> "AA"),
        "172.16.0.0/12" -> Map("country" -> "BB"),
        "192.168.0.0/16" -> Map("country" -> "CC"),
        "203.0.113.0/24" -> Map("country" -> "DD"))
      // per-run temp file: a fixed shared path would race a concurrent
      // driver/test JVM's truncate-then-write against this read
      val path = java.nio.file.Files.createTempFile("graft-q-geoip", ".mmdb")
      java.nio.file.Files.write(path, graft.sources.Mmdb.encode(nets, ipVersion = 6))
      val ranges =
        try graft.sources.Mmdb.readRanges(s, path.toString) // eager driver-side read
        finally java.nio.file.Files.deleteIfExists(path)
      val ev = t(s, d, "events").select(
        col("event_id"),
        pmod(col("event_id") * 2654435761L, lit(4294967296L)).as("ipn"))
      Contexts.enrichRange(ev, col("ipn"), ranges)
    }),

    // ip/subnet scalar-function module (is_v4, numeric form, network mask,
    // CIDR containment, RFC1918) over a valid/malformed IP mix
    "q_ipfns" -> ((s, d) => {
      val ev = t(s, d, "events").select(
        col("event_id"),
        when(pmod(col("event_id"), lit(7)) === 0, lit("999.1.1.1"))
          .otherwise(concat(
            lit("10."), pmod(col("user_id"), lit(200)).cast("string"),
            lit("."), pmod(col("event_id"), lit(256)).cast("string"),
            lit(".25"))).as("ip"))
      ev.select(
        col("event_id"), col("ip"),
        Ip.isV4(col("ip")).as("is_v4"),
        Ip.safeIpToLong(col("ip")).as("ipn"),
        when(Ip.isV4(col("ip")), Ip.network(col("ip"), lit(12))).as("net12"),
        Ip.cidrContains(lit("10.64.0.0/10"), col("ip")).as("in_10_64_10"),
        Ip.isPrivate(col("ip")).as("is_private"))
    }),

    // Crypto-PAn-structured prefix-preserving pseudonymization
    "q_pseudonymize" -> ((s, d) => {
      val ev = t(s, d, "events").select(
        col("event_id"),
        pmod(col("event_id") * 2654435761L, lit(4294967296L)).as("ipn"))
      ev.select(
        col("event_id"),
        Privacy.numToDotted(col("ipn")).as("ip"),
        Privacy.numToDotted(Privacy.pseudonymizeIp(col("ipn"), PanKey)).as("pseudo_ip"))
    }),

    // subnet longest-prefix context
    "q_enrich_subnet" -> ((s, d) => {
      val sess = s
      import sess.implicits._
      val ctx = Seq(
        ("10.0.0.0/8", "wide"),
        ("10.5.0.0/16", "mid"),
        ("10.5.1.0/24", "narrow")).toDF("cidr", "tag")
      val ev = t(s, d, "events").select(
        col("event_id"),
        concat(lit("10."), pmod(col("user_id"), lit(16)).cast("string"),
          lit("."), pmod(col("event_id"), lit(4)).cast("string"), lit(".9")).as("ip"))
      Contexts.enrichLongestPrefix(ev, "event_id", col("ip"), ctx)
        .select("event_id", "ip", "tag", "prefix_len")
    })
  )

  private val Md5h60 = "('0x' || substr(md5(%s), 1, 15))::BIGINT"

  val oracleSql: Map[String, String] = Map(
    "q_bloom" ->
      s"""WITH h AS (SELECT ${Md5h60.format("concat('c', CAST(c_custkey AS VARCHAR))")} AS h FROM customer),
         |pos AS (SELECT unnest([(h >> 30) % $M, (h & 1073741823) % $M]) AS p FROM h),
         |words AS (SELECT CAST(p // 32 AS INTEGER) AS w,
         |  bit_or((1::BIGINT) << CAST(p % 32 AS INTEGER)) AS bits FROM pos GROUP BY 1),
         |probe AS (SELECT o_orderkey,
         |  CASE WHEN o_orderkey % 3 = 0 THEN concat('c', CAST(o_custkey AS VARCHAR))
         |       ELSE concat('x', CAST(o_orderkey AS VARCHAR)) END AS key FROM orders),
         |ph AS (SELECT o_orderkey, key, ${Md5h60.format("key")} AS h FROM probe),
         |pp AS (SELECT o_orderkey, key, (h >> 30) % $M AS p1, (h & 1073741823) % $M AS p2 FROM ph)
         |SELECT o_orderkey, key,
         |  coalesce(((w1.bits >> CAST(p1 % 32 AS INTEGER)) & 1) = 1, false)
         |    AND coalesce(((w2.bits >> CAST(p2 % 32 AS INTEGER)) & 1) = 1, false) AS might_contain
         |FROM pp
         |LEFT JOIN words w1 ON w1.w = CAST(p1 // 32 AS INTEGER)
         |LEFT JOIN words w2 ON w2.w = CAST(p2 // 32 AS INTEGER)""".stripMargin,
    "q_enrich_ttl" ->
      """WITH ctx AS (SELECT c_custkey, c_name,
        |  TIMESTAMP '1995-01-01 00:00:00' + to_hours(c_custkey % 1000) AS created_ts,
        |  TIMESTAMP '1995-01-01 00:00:00' + to_hours(c_custkey % 1000 + 240) AS updated_ts
        |  FROM customer)
        |SELECT o_orderkey, o_custkey AS c_custkey,
        |  CASE WHEN ctx.c_custkey IS NOT NULL
        |        AND o_orderdate < created_ts + to_seconds(90 * 86400)
        |        AND o_orderdate < updated_ts + to_seconds(120 * 86400)
        |       THEN c_name END AS c_name
        |FROM orders LEFT JOIN ctx ON o_custkey = ctx.c_custkey""".stripMargin,
    "q_enrich_range" ->
      """WITH ctx(range_lo, range_hi, rir) AS (VALUES
        |  (0, 999999999, 'apnic'), (1000000000, 1999999999, 'ripe'),
        |  (2000000000, 2999999999, 'arin'), (3000000000, 4294967295, 'lacnic')),
        |ev AS (SELECT event_id, (event_id * 2654435761) % 4294967296 AS ipn FROM events)
        |SELECT ev.event_id, ev.ipn, ctx.rir
        |FROM ev LEFT JOIN ctx ON ev.ipn >= ctx.range_lo AND ev.ipn <= ctx.range_hi""".stripMargin,
    "q_geoip" ->
      """WITH ctx(range_lo, range_hi, country) AS (VALUES
        |  (167772160, 184549375, 'AA'), (2886729728, 2887778303, 'BB'),
        |  (3232235520, 3232301055, 'CC'), (3405803776, 3405804031, 'DD')),
        |ev AS (SELECT event_id, (event_id * 2654435761) % 4294967296 AS ipn FROM events)
        |SELECT ev.event_id, ev.ipn, ctx.country
        |FROM ev LEFT JOIN ctx ON ev.ipn >= ctx.range_lo AND ev.ipn <= ctx.range_hi""".stripMargin,
    "q_ipfns" -> {
      val v4re = """^(25[0-5]|2[0-4][0-9]|1?[0-9]?[0-9])(\.(25[0-5]|2[0-4][0-9]|1?[0-9]?[0-9])){3}$"""
      def dotted(e: String) =
        s"concat(CAST((($e) >> 24) & 255 AS VARCHAR), '.', CAST((($e) >> 16) & 255 AS VARCHAR), " +
          s"'.', CAST((($e) >> 8) & 255 AS VARCHAR), '.', CAST(($e) & 255 AS VARCHAR))"
      s"""WITH ev AS (SELECT event_id,
         |  CASE WHEN event_id % 7 = 0 THEN '999.1.1.1'
         |       ELSE concat('10.', CAST(user_id % 200 AS VARCHAR), '.',
         |                   CAST(event_id % 256 AS VARCHAR), '.25') END AS ip
         |  FROM events),
         |n AS (SELECT event_id, ip, regexp_matches(ip, '$v4re') AS is_v4,
         |  CASE WHEN regexp_matches(ip, '$v4re') THEN
         |    CAST(split_part(ip, '.', 1) AS BIGINT) * 16777216
         |    + CAST(split_part(ip, '.', 2) AS BIGINT) * 65536
         |    + CAST(split_part(ip, '.', 3) AS BIGINT) * 256
         |    + CAST(split_part(ip, '.', 4) AS BIGINT) END AS ipn FROM ev)
         |SELECT event_id, ip, is_v4, ipn,
         |  CASE WHEN is_v4 THEN ${dotted("ipn & 4293918720")} END AS net12,
         |  (ipn & 4290772992) = 171966464 AS in_10_64_10,
         |  ((ipn & 4278190080) = 167772160 OR (ipn & 4293918720) = 2886729728
         |   OR (ipn & 4294901760) = 3232235520) AS is_private
         |FROM n""".stripMargin
    },
    "q_pseudonymize" -> {
      def dotted(e: String) =
        s"concat(CAST((($e) >> 24) & 255 AS VARCHAR), '.', CAST((($e) >> 16) & 255 AS VARCHAR), " +
          s"'.', CAST((($e) >> 8) & 255 AS VARCHAR), '.', CAST(($e) & 255 AS VARCHAR))"
      s"""WITH ip AS (SELECT event_id, (event_id * 2654435761) % 4294967296 AS ipn FROM events),
         |p AS (SELECT event_id, ipn,
         |  ${graft.ops.Privacy.pseudonymizeIpSql("ipn", PanKey)} AS pn FROM ip)
         |SELECT event_id, ${dotted("ipn")} AS ip, ${dotted("pn")} AS pseudo_ip FROM p""".stripMargin
    },
    "q_enrich_subnet" ->
      """WITH ctx(cidr, tag) AS (VALUES
        |  ('10.0.0.0/8', 'wide'), ('10.5.0.0/16', 'mid'), ('10.5.1.0/24', 'narrow')),
        |sub AS (SELECT tag,
        |  CAST(split_part(cidr, '/', 2) AS INTEGER) AS len,
        |  CASE WHEN CAST(split_part(cidr, '/', 2) AS INTEGER) = 0 THEN 0
        |       ELSE xor(4294967295, (1::BIGINT << (32 - CAST(split_part(cidr, '/', 2) AS INTEGER))) - 1) END AS mask,
        |  (CAST(split_part(split_part(cidr, '/', 1), '.', 1) AS BIGINT) * 16777216
        |   + CAST(split_part(split_part(cidr, '/', 1), '.', 2) AS BIGINT) * 65536
        |   + CAST(split_part(split_part(cidr, '/', 1), '.', 3) AS BIGINT) * 256
        |   + CAST(split_part(split_part(cidr, '/', 1), '.', 4) AS BIGINT)) AS base0
        |  FROM ctx),
        |subn AS (SELECT tag, len, mask, (base0 & mask) AS base FROM sub),
        |ev AS (SELECT event_id, concat('10.', CAST(user_id % 16 AS VARCHAR), '.',
        |  CAST(event_id % 4 AS VARCHAR), '.9') AS ip FROM events),
        |evn AS (SELECT event_id, ip,
        |  (CAST(split_part(ip, '.', 1) AS BIGINT) * 16777216
        |   + CAST(split_part(ip, '.', 2) AS BIGINT) * 65536
        |   + CAST(split_part(ip, '.', 3) AS BIGINT) * 256
        |   + CAST(split_part(ip, '.', 4) AS BIGINT)) AS ipn FROM ev),
        |best AS (SELECT event_id, arg_max(tag, len) AS tag, max(len) AS prefix_len
        |  FROM evn JOIN subn ON (ipn & mask) = base GROUP BY event_id)
        |SELECT e.event_id, e.ip, b.tag, b.prefix_len
        |FROM ev e LEFT JOIN best b ON e.event_id = b.event_id""".stripMargin
  )
}
