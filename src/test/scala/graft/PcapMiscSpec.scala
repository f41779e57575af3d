package graft

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.functions._

import graft.formats.Pcap
import graft.functions.Ocsf
import graft.ops.Pipe._
import graft.sources.{Files => GFiles}

/** PCAP framing + decapsulation, chart aggregation metadata, OCSF mappings,
  * and the files source.
  */
class PcapMiscSpec extends SparkSpec {
  import spark.implicits._

  private def hexBytes(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  // Ethernet-II / IPv4 / TCP: 10.0.0.1:1234 -> 192.168.1.2:80
  private val tcpPacket = hexBytes(
    "aabbccddeeff 112233445566 0800" +
    "4500 0028 0001 0000 4006 0000 0a000001 c0a80102" +
    "04d2 0050 00000000 00000000 5000 0000 0000 0000")

  // same hosts, UDP 53 -> 5353
  private val udpPacket = hexBytes(
    "aabbccddeeff 112233445566 0800" +
    "4500 0028 0001 0000 4011 0000 0a000001 c0a80102" +
    "0035 14e9 0010 0000")

  // 802.1Q VLAN 101 wrapping the TCP packet's IP payload
  private val vlanPacket = hexBytes(
    "aabbccddeeff 112233445566 8100 0065 0800" +
    "4500 0028 0001 0000 4006 0000 0a000001 c0a80102" +
    "04d2 0050 00000000 00000000 5000 0000 0000 0000")

  private def pcapFile(order: ByteOrder, packets: Seq[Array[Byte]],
      baseTs: Int = 1700000000): Array[Byte] = {
    val size = 24 + packets.map(16 + _.length).sum
    val buf = ByteBuffer.allocate(size).order(order)
    buf.putInt(0xa1b2c3d4) // µs magic (byte-swapped on LE — the parser detects it)
    buf.putShort(2.toShort); buf.putShort(4.toShort) // version
    buf.putInt(0); buf.putInt(0) // thiszone, sigfigs
    buf.putInt(65535) // snaplen
    buf.putInt(1) // linktype EN10MB
    packets.zipWithIndex.foreach { case (p, i) =>
      buf.putInt(baseTs + i) // ts_sec
      buf.putInt(250000) // ts_usec
      buf.putInt(p.length); buf.putInt(p.length)
      buf.put(p)
    }
    buf.array()
  }

  test("readPcap frames packets in both endiannesses; decapsulate walks the headers") {
    val dir = tmpDir("pcap")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "le.pcap"),
      pcapFile(ByteOrder.LITTLE_ENDIAN, Seq(tcpPacket, udpPacket)))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "be.pcap"),
      pcapFile(ByteOrder.BIG_ENDIAN, Seq(vlanPacket), baseTs = 1700000100))

    val pk = Pcap.readPcap(spark, dir)
    assert(pk.count() == 3)
    assert(pk.select("linktype").distinct().as[Int].collect().toSeq == Seq(1))
    // timestamps decode identically across endianness
    val ts = pk.select("ts").as[java.sql.Timestamp].collect()
    assert(ts.forall(_.getTime / 1000 >= 1700000000L))

    val dec = Pcap.decapsulate(pk).orderBy("ts")
    val rows = dec.select(
      col("ether.src"), col("ether.dst"), col("ether.type"),
      col("ip.src"), col("ip.dst"), col("ip.type"),
      col("tcp.src_port"), col("udp.src_port"), col("vlan.outer"),
      col("community_id")).collect()

    val tcpRow = rows(0)
    assert(tcpRow.getString(0) == "11:22:33:44:55:66")
    assert(tcpRow.getString(1) == "aa:bb:cc:dd:ee:ff")
    assert(tcpRow.getLong(2) == 0x0800L)
    assert(tcpRow.getString(3) == "10.0.0.1" && tcpRow.getString(4) == "192.168.1.2")
    assert(tcpRow.getLong(5) == 6L && tcpRow.getLong(6) == 1234L)
    assert(tcpRow.isNullAt(7) && tcpRow.isNullAt(8))
    assert(tcpRow.getString(9).startsWith("1:"))

    val udpRow = rows(1)
    assert(udpRow.getLong(5) == 17L && udpRow.getLong(7) == 53L)

    val vlanRow = rows(2)
    assert(vlanRow.getLong(8) == 101L, "VLAN id")
    assert(vlanRow.getString(3) == "10.0.0.1" && vlanRow.getLong(6) == 1234L,
      "IP/TCP fields shift past the 802.1Q tag")
  }

  test("decapsulate community_id matches the Ip module on the same 5-tuple") {
    val direct = spark.range(1).select(
      graft.functions.Ip.communityId(lit("10.0.0.1"), lit("192.168.1.2"),
        lit(1234L), lit(80L), lit(6L)).as("cid")).as[String].head()
    val viaPacket = Pcap.decapsulate(
      Seq((1, tcpPacket)).toDF("linktype", "data"))
      .select(col("community_id")).as[String].head()
    assert(direct == viaPacket)
  }

  test("chart_ aggregates, sorts, and attaches chart metadata") {
    val df = Seq(
      ("2024-01-02 10:00:00", 5L), ("2024-01-01 09:00:00", 3L),
      ("2024-01-01 17:00:00", 4L)).toDF("ts0", "v")
      .select(col("ts0").cast("timestamp").as("ts"), col("v"))
    val c = df.chart_("bar", "ts", Seq("total" -> sum(col("v"))), resolution = Some("day"))
    // resolution-bucketed x is timestamp_ntz → collects as LocalDateTime
    val got = c.collect().map(r => (r.get(0).toString, r.getLong(1))).toSeq
    assert(got == Seq("2024-01-01T00:00" -> 7L, "2024-01-02T00:00" -> 5L))
    assert(c.getAttribute_("ts", "chart:type").contains("bar"))
    assert(c.getAttribute_("ts", "chart:axis").contains("x"))
    assert(c.getAttribute_("total", "chart:axis").contains("y"))
    intercept[IllegalArgumentException](df.chart_("sparkline", "ts", Seq("n" -> count(lit(1)))))
  }

  test("OCSF mappings round-trip and null on unknown keys") {
    val r = spark.range(1).select(
      Ocsf.classUid(lit("HTTP Activity")).as("a"),
      Ocsf.className(lit(4003)).as("b"),
      Ocsf.categoryUid(lit("Findings")).as("c"),
      Ocsf.categoryName(lit(6)).as("d"),
      Ocsf.classUid(lit("Nonexistent")).as("e")).head()
    assert(r.getLong(0) == 4002L)
    assert(r.getString(1) == "DNS Activity")
    assert(r.getLong(2) == 2L)
    assert(r.getString(3) == "Application Activity")
    assert(r.isNullAt(4))
    // every class round-trips
    val all = Ocsf.classes.keys.toSeq.toDF("name")
      .select(Ocsf.className(Ocsf.classUid(col("name"))).as("rt"), col("name"))
      .filter(col("rt") =!= col("name"))
    assert(all.count() == 0)
  }

  test("files source lists, file_contents reads distributed") {
    val dir = tmpDir("files")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "a.txt"), "hello".getBytes)
    java.nio.file.Files.createDirectory(java.nio.file.Paths.get(dir, "sub"))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "sub", "b.txt"), "world!".getBytes)

    val flat = GFiles.files(spark, dir)
    assert(flat.count() == 1)
    val rec = GFiles.files(spark, dir, recurse = true)
    assert(rec.count() == 2)
    assert(rec.columns.toSeq == Seq("path", "type", "size", "mtime"))
    assert(rec.agg(sum("size")).head().getLong(0) == 11L)

    val contents = GFiles.fileContents(spark, dir, recurse = true)
      .select(GFiles.fileName(col("path")).as("f"), col("text"))
      .as[(String, String)].collect().toMap
    assert(contents == Map("a.txt" -> "hello", "b.txt" -> "world!"))
    assert(new String(GFiles.fileContentsOf(spark, s"$dir/a.txt")) == "hello")
    assert(GFiles.parentDir(lit(s"$dir/sub/b.txt")).toString.nonEmpty)
  }

  test("host introspection sources: processes, sockets, nics") {
    import graft.sources.Host
    val procs = Host.processes(spark)
    assert(procs.columns.toSeq ==
      Seq("pid", "name", "state", "ppid", "threads", "rss_bytes"))
    val self = ProcessHandle.current().pid()
    assert(procs.filter(col("pid") === self).count() == 1, "own JVM pid listed")
    assert(procs.filter(col("pid") === 1).count() == 1)

    // bind a listener, then find it in the sockets table (the JVM binds
    // dual-stack, so the row may live in the tcp6 table as ::ffff:7f00:0001)
    val srv = new java.net.ServerSocket(0, 1,
      java.net.InetAddress.getByName("127.0.0.1"))
    try {
      val port = srv.getLocalPort
      val hit = Host.sockets(spark)
        .filter(col("protocol").startsWith("tcp") && col("local_port") === port &&
          col("state") === "LISTEN")
      assert(hit.count() >= 1, s"listening socket on $port visible")
    } finally srv.close()
    assert(Host.parseHexAddr("0100007F:1F90") == ("127.0.0.1", 8080))

    val nics = Host.nics(spark)
    assert(nics.filter(col("name") === "lo").count() == 1, "loopback nic listed")
  }
}
