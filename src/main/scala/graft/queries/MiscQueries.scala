package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.formats.Pcap
import graft.functions.Ocsf
import graft.ops.Pipe._

/** Driver-checked query catalog, part 7: chart aggregation (`chart2.cpp`),
  * packet decapsulation (`decapsulate.cpp`), and the OCSF mapping functions
  * (`functions/ocsf.cpp`).
  *
  * q_decapsulate synthesizes a real Ethernet-II + IPv4 + TCP packet per event
  * row (both engines derive the same bytes deterministically from the event
  * columns), runs the actual binary header walk Spark-side, and has DuckDB
  * recompute every extracted field from first principles — an exact oracle
  * over the parse arithmetic.
  */
object MiscQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Fixed-width uppercase hex of a non-negative long, `n` nibbles. */
  private def hexn(c: Column, n: Int): Column = lpad(hex(c), n, "0")

  private val srcIpN: Column = lit(167772160L) + pmod(col("user_id"), lit(1048576L)) // 10.x.y.z
  private val dstIpN: Column = lit(3232235520L) + pmod(col("event_id"), lit(65536L)) // 192.168.x.y
  private val sportN: Column = lit(1024L) + pmod(col("event_id"), lit(60000L))

  /** Ethernet-II + IPv4(20B) + TCP(20B) frame from event columns. */
  private val packetBytes: Column = concat(
    unhex(hexn(pmod(col("user_id"), lit(16777216L)), 12)), // eth dst
    unhex(hexn(pmod(col("event_id"), lit(16777216L)), 12)), // eth src
    unhex(lit("0800")), // ethertype IPv4
    unhex(lit("450000280000000040060000")), // ver/ihl tos len id flags ttl proto cksum
    unhex(hexn(srcIpN, 8)),
    unhex(hexn(dstIpN, 8)),
    unhex(hexn(sportN, 4)),
    unhex(lit("0050")), // dport 80
    unhex(lit("00000000000000005000000000000000"))) // seq/ack/off/flags/win/ck/urg

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_chart" -> ((s, d) =>
      t(s, d, "events").chart_("line", "ts",
        Seq(
          "total" -> sum(floor(col("value")).cast("long")),
          "n" -> count(lit(1))),
        resolution = Some("day"))),

    "q_decapsulate" -> ((s, d) =>
      Pcap.decapsulate(
        t(s, d, "events")
          .select(col("event_id"), lit(1).as("linktype"), packetBytes.as("data")))
        .select(
          col("event_id"),
          col("ether.src").as("eth_src"),
          col("ether.dst").as("eth_dst"),
          col("ether.type").as("eth_type"),
          col("ip.src").as("src_ip"),
          col("ip.dst").as("dst_ip"),
          col("ip.type").as("proto"),
          col("tcp.src_port").as("src_port"),
          col("tcp.dst_port").as("dst_port"))),

    "q_ocsf" -> ((s, d) => {
      val classUidIn = lit(4001L) + pmod(col("event_id"), lit(14L))
      val catUidIn = lit(1L) + pmod(col("event_id"), lit(7L))
      t(s, d, "events").select(
        col("event_id"),
        Ocsf.className(classUidIn).as("class_name"),
        Ocsf.classUid(Ocsf.className(classUidIn)).as("class_uid_rt"),
        Ocsf.categoryName(catUidIn).as("category_name"),
        Ocsf.categoryUid(Ocsf.categoryName(catUidIn)).as("category_uid_rt"))
    }))

  /** DuckDB CASE arm list for a uid→name map over `expr`. */
  private def caseOf(m: Map[String, Long], expr: String): String =
    m.toSeq.sortBy(_._2).map { case (n, id) =>
      s"WHEN $id THEN '${n.replace("'", "''")}'"
    }.mkString(s"CASE $expr ", " ", " END")

  /** Dotted quad of a numeric-IP SQL expression. */
  private def dotted(e: String): String =
    s"concat(CAST(($e) // 16777216 % 256 AS VARCHAR), '.', " +
    s"CAST(($e) // 65536 % 256 AS VARCHAR), '.', " +
    s"CAST(($e) // 256 % 256 AS VARCHAR), '.', CAST(($e) % 256 AS VARCHAR))"

  /** `aa:bb:…` MAC of a 48-bit SQL expression. */
  private def macOf(e: String): String =
    s"rtrim(regexp_replace(lower(lpad(to_hex($e), 12, '0')), '(..)', '\\1:', 'g'), ':')"

  val oracleSql: Map[String, String] = Map(
    "q_chart" ->
      """SELECT date_trunc('day', ts) AS ts,
        |  CAST(sum(CAST(floor(value) AS BIGINT)) AS BIGINT) AS total, count(*) AS n
        |FROM events GROUP BY 1 ORDER BY 1 LIMIT 100000""".stripMargin,

    "q_decapsulate" ->
      s"""SELECT event_id,
         |  ${macOf("event_id % 16777216")} AS eth_src,
         |  ${macOf("user_id % 16777216")} AS eth_dst,
         |  CAST(2048 AS BIGINT) AS eth_type,
         |  ${dotted("167772160 + user_id % 1048576")} AS src_ip,
         |  ${dotted("3232235520 + event_id % 65536")} AS dst_ip,
         |  CAST(6 AS BIGINT) AS proto,
         |  CAST(1024 + event_id % 60000 AS BIGINT) AS src_port,
         |  CAST(80 AS BIGINT) AS dst_port
         |FROM events""".stripMargin,

    "q_ocsf" ->
      s"""SELECT event_id,
         |  ${caseOf(Ocsf.classes.filter(c => c._2 >= 4001 && c._2 <= 4014), "4001 + event_id % 14")} AS class_name,
         |  CAST(4001 + event_id % 14 AS BIGINT) AS class_uid_rt,
         |  ${caseOf(Ocsf.categories, "1 + event_id % 7")} AS category_name,
         |  CAST(1 + event_id % 7 AS BIGINT) AS category_uid_rt
         |FROM events""".stripMargin)
}
