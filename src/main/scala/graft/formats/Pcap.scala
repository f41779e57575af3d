package graft.formats

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Ip

/** PCAP ingest + packet decapsulation.
  *
  * Reference analogues: `read_pcap` file framing
  * (`/root/reference/libtenzir/builtins/formats/pcap.cpp`) and the
  * `decapsulate` operator's Ethernet/VLAN → IPv4 → TCP/UDP/ICMP header walk
  * (`/root/reference/libtenzir/builtins/operators/decapsulate.cpp:224-296`,
  * which emits `ether{src,dst,type}`, `ip{src,dst,type}`,
  * `tcp/udp{src_port,dst_port}`, `icmp{type,code}`, `community_id`).
  *
  * Spark-first split of the work:
  *  - '''decapsulate''' is fixed-offset header arithmetic — expressed entirely
  *    as built-in Column functions over the binary payload (`substr`/`hex`/
  *    `conv`), so it stays inside whole-stage codegen and distributes like any
  *    projection. No UDFs, no per-row JVM objects.
  *  - '''pcap file framing''' is a variable-length record walk over one blob —
  *    inherently sequential per file, so it runs as a typed `flatMap` over
  *    `binaryFile` rows (one task per capture file; a 100 TB capture corpus
  *    parallelizes across files, the same unit the reference uses).
  */
object Pcap {

  // ------------------------------------------------------------ decapsulate

  /** Unsigned big-endian int of `len` bytes at 1-based `pos` (binary-safe). */
  private def beInt(b: Column, pos: Column, len: Int): Column =
    conv(hex(b.substr(pos, lit(len))), 16, 10).cast("long")

  private def u8(b: Column, pos: Column): Column = beInt(b, pos, 1)
  private def u16(b: Column, pos: Column): Column = beInt(b, pos, 2)

  /** `aa:bb:cc:dd:ee:ff` — lower-case colon-separated MAC at `pos`. */
  private def macStr(b: Column, pos: Column): Column =
    concat_ws(":", (0 until 6).map(i => lower(hex(b.substr(pos + lit(i), lit(1))))): _*)

  /** Dotted-quad IPv4 string at `pos`. */
  private def ipv4Str(b: Column, pos: Column): Column =
    concat_ws(".", (0 until 4).map(i => u8(b, pos + lit(i)).cast("string")): _*)

  /** Decapsulate Ethernet-II frames (link type 1 / EN10MB) carrying IPv4:
    * adds `ether`, `vlan`, `ip`, `tcp`, `udp`, `icmp`, `community_id` columns
    * (null where the layer is absent). Unknown link/ether/protocol types pass
    * through with null decodes — the reference likewise skips frames it cannot
    * parse rather than erroring (`decapsulate.cpp:210-217`).
    */
  def decapsulate(df: DataFrame, dataCol: String = "data",
      linktypeCol: String = "linktype"): DataFrame = {
    val d = col(dataCol)
    val isEther = col(linktypeCol) === 1
    val ethType0 = u16(d, lit(13))
    val hasVlan = ethType0 === 0x8100
    val ethType = when(hasVlan, u16(d, lit(17))).otherwise(ethType0)
    val ipOff = when(hasVlan, lit(19)).otherwise(lit(15))
    val isIp4 = isEther && ethType === 0x0800
    val ihl = (u8(d, ipOff).bitwiseAND(lit(15L)) * 4).cast("int")
    val proto = when(isIp4, u8(d, ipOff + lit(9)))
    val srcIp = ipv4Str(d, ipOff + lit(12))
    val dstIp = ipv4Str(d, ipOff + lit(16))
    val l4 = ipOff + ihl
    val sport = u16(d, l4)
    val dport = u16(d, l4 + lit(2))
    val ports = proto === 6 || proto === 17

    df
      .withColumn("ether", when(isEther, struct(
        macStr(d, lit(7)).as("src"),
        macStr(d, lit(1)).as("dst"),
        ethType.as("type"))))
      .withColumn("vlan", when(isEther && hasVlan,
        struct(u16(d, lit(15)).bitwiseAND(lit(0x0fffL)).as("outer"))))
      .withColumn("ip", when(isIp4, struct(
        srcIp.as("src"), dstIp.as("dst"), proto.as("type"))))
      .withColumn("tcp", when(isIp4 && proto === 6,
        struct(sport.as("src_port"), dport.as("dst_port"))))
      .withColumn("udp", when(isIp4 && proto === 17,
        struct(sport.as("src_port"), dport.as("dst_port"))))
      .withColumn("icmp", when(isIp4 && proto === 1,
        struct(u8(d, l4).as("type"), u8(d, l4 + lit(1)).as("code"))))
      .withColumn("community_id", when(isIp4 && ports,
        Ip.communityId(srcIp, dstIp, sport, dport, proto)))
  }

  // ------------------------------------------------------------ pcap framing

  /** One captured packet (the reference's `pcap.packet` schema,
    * `pcap.cpp`: linktype + timestamp + lengths + payload blob).
    */
  case class Packet(
      path: String,
      linktype: Int,
      ts: java.sql.Timestamp,
      captured_packet_length: Int,
      original_packet_length: Int,
      data: Array[Byte])

  /** Parse one classic-pcap byte stream (both endiannesses, µs and ns magic).
    * Truncated trailing records are dropped, matching libpcap behavior.
    */
  def parseFile(path: String, bytes: Array[Byte]): Seq[Packet] = {
    if (bytes.length < 24) return Seq.empty
    val magicBe = ByteBuffer.wrap(bytes, 0, 4).order(ByteOrder.BIG_ENDIAN).getInt
    val (order, nanos) = magicBe match {
      case 0xa1b2c3d4 => (ByteOrder.BIG_ENDIAN, false)
      case 0xd4c3b2a1 => (ByteOrder.LITTLE_ENDIAN, false)
      case 0xa1b23c4d => (ByteOrder.BIG_ENDIAN, true)
      case 0x4d3cb2a1 => (ByteOrder.LITTLE_ENDIAN, true)
      case _ => return Seq.empty // not a classic pcap
    }
    val buf = ByteBuffer.wrap(bytes).order(order)
    val linktype = buf.getInt(20)
    val out = Seq.newBuilder[Packet]
    var off = 24
    while (off + 16 <= bytes.length) {
      val sec = buf.getInt(off).toLong & 0xffffffffL
      val sub = buf.getInt(off + 4).toLong & 0xffffffffL
      val incl = buf.getInt(off + 8)
      val orig = buf.getInt(off + 12)
      if (incl < 0 || off + 16 + incl > bytes.length) {
        off = bytes.length // truncated tail: stop
      } else {
        val data = java.util.Arrays.copyOfRange(bytes, off + 16, off + 16 + incl)
        val micros = if (nanos) sub / 1000 else sub
        val ts = new java.sql.Timestamp(sec * 1000 + micros / 1000)
        ts.setNanos(((micros % 1000000) * 1000).toInt)
        out += Packet(path, linktype, ts, incl, orig, data)
        off += 16 + incl
      }
    }
    out.result()
  }

  /** `read_pcap` — capture files under `path` → one row per packet. */
  def readPcap(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) => parseFile(p, bytes) }
      .toDF()
  }
}
