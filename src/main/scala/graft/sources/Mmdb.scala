package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** MaxMind DB (.mmdb, MaxMind DB spec 2.0 — a public binary format) reader:
  * parses the binary search tree + data section DRIVER-SIDE into a sorted
  * table of disjoint `(range_lo, range_hi, attributes…)` IPv4 ranges, the
  * exact context shape [[graft.ops.Contexts.enrichRange]] broadcasts. This
  * completes the geoip context family (reference
  * `libtenzir/builtins/contexts/geoip.cpp` wraps libmaxminddb's `MMDB_open` /
  * lookup and converts `entry_data_list` values the same way :117-210): a
  * user with a real GeoLite2 file loads it once on the driver (the file is
  * MBs of metadata by design — mmdbs are memory-mapped lookup structures)
  * and the probe stays a broadcast range join; the event stream never
  * shuffles.
  *
  * Scope: IPv4 space. For `ip_version=6` databases the reader walks the
  * 96-zero-bit prefix to the IPv4-mapped subtree (the layout MaxMind's own
  * v6 databases use for v4 addresses). Values are flattened to dotted-path
  * string columns (`country.iso_code`, `city.names.en`, `subdivisions.0…`),
  * matching the reference's record flattening.
  */
object Mmdb {

  private val MetaMarker =
    Array[Byte](0xab.toByte, 0xcd.toByte, 0xef.toByte) ++
      "MaxMind.com".getBytes(StandardCharsets.US_ASCII)

  private case class Meta(nodeCount: Int, recordSize: Int, ipVersion: Int)

  /** One extracted leaf: inclusive uint32 bounds + flattened attributes. */
  final case class IpRange(lo: Long, hi: Long, values: Map[String, String])

  // ------------------------------------------------------------ data decode

  /** Decoder over one byte region with the MMDB data-section encoding.
    * `base` = absolute offset of the data section (pointer targets are
    * relative to it).
    */
  private final class Decoder(bytes: Array[Byte], base: Int) {
    private val memo = scala.collection.mutable.Map.empty[Int, Any]

    private def u8(i: Int): Int = bytes(i) & 0xff
    private def beInt(off: Int, n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 8) | u8(off + i); i += 1 }
      v
    }

    /** Decode the value at absolute offset `off`; returns (value, next offset). */
    def decode(off: Int): (Any, Int) = {
      val ctrl = u8(off)
      var ty = ctrl >> 5
      var p = off + 1
      if (ty == 0) { ty = 7 + u8(p); p += 1 } // extended type
      if (ty == 1) { // pointer: 2-bit size selector + 3 payload bits
        val ss = (ctrl >> 3) & 0x3
        val v3 = ctrl & 0x7
        val (target, next) = ss match {
          case 0 => (((v3.toLong << 8) | u8(p)).toInt, p + 1)
          case 1 => (((v3.toLong << 16) | beInt(p, 2)).toInt + 2048, p + 2)
          case 2 => (((v3.toLong << 24) | beInt(p, 3)).toInt + 526336, p + 3)
          case _ => (beInt(p, 4).toInt, p + 4)
        }
        val v = memo.getOrElseUpdate(target, decode(base + target)._1)
        return (v, next)
      }
      var size = ctrl & 0x1f
      if (size == 29) { size = 29 + u8(p); p += 1 }
      else if (size == 30) { size = 285 + beInt(p, 2).toInt; p += 2 }
      else if (size == 31) { size = 65821 + beInt(p, 3).toInt; p += 3 }
      ty match {
        case 2 => (new String(bytes, p, size, StandardCharsets.UTF_8), p + size)
        case 3 => (java.lang.Double.longBitsToDouble(beInt(p, 8)), p + 8)
        case 4 => (java.util.Arrays.copyOfRange(bytes, p, p + size), p + size)
        case 5 | 6 => (beInt(p, size), p + size) // uint16/32
        case 9 => // uint64: top-bit values must not wrap negative
          (BigInt(1, java.util.Arrays.copyOfRange(bytes, p, p + size)), p + size)
        case 8 => // int32, size bytes, sign-extended
          val raw = beInt(p, size)
          val shift = 64 - size * 8
          (if (size == 0) 0L else (raw << shift) >> shift, p + size)
        case 10 => (BigInt(1, java.util.Arrays.copyOfRange(bytes, p, p + size)), p + size)
        case 7 => // map: size entries of key (string/pointer) then value
          var q = p
          val m = Map.newBuilder[String, Any]
          var i = 0
          while (i < size) {
            val (k, q1) = decode(q)
            val (v, q2) = decode(q1)
            m += (k.asInstanceOf[String] -> v)
            q = q2; i += 1
          }
          (m.result(), q)
        case 11 => // array
          var q = p
          val b = Vector.newBuilder[Any]
          var i = 0
          while (i < size) { val (v, q1) = decode(q); b += v; q = q1; i += 1 }
          (b.result(), q)
        case 14 => (size != 0, p) // boolean: size IS the value
        case 15 => (java.lang.Float.intBitsToFloat(beInt(p, 4).toInt), p + 4)
        case other => sys.error(s"mmdb: unsupported data type $other at offset $off")
      }
    }
  }

  private def flatten(v: Any, prefix: String, out: scala.collection.mutable.Map[String, String]): Unit =
    v match {
      case m: Map[_, _] => m.foreach { case (k, x) =>
        flatten(x, if (prefix.isEmpty) k.toString else s"$prefix.$k", out) }
      case a: Vector[_] => a.zipWithIndex.foreach { case (x, i) => flatten(x, s"$prefix.$i", out) }
      case b: Array[Byte] => out(prefix) = java.util.Base64.getEncoder.encodeToString(b)
      case null => ()
      case other => out(prefix) = other.toString
    }

  // ----------------------------------------------------------------- parse

  private def lastIndexOf(hay: Array[Byte], needle: Array[Byte]): Int = {
    var i = hay.length - needle.length
    while (i >= 0) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i -= 1
    }
    -1
  }

  /** Parse an mmdb byte image into disjoint IPv4 ranges (sorted by lo),
    * adjacent same-valued leaves merged.
    */
  def parseRanges(bytes: Array[Byte]): Seq[IpRange] = {
    val mi = lastIndexOf(bytes, MetaMarker)
    require(mi >= 0, "mmdb: metadata marker not found (not an mmdb file)")
    val metaDec = new Decoder(bytes, mi + MetaMarker.length)
    val meta0 = metaDec.decode(mi + MetaMarker.length)._1.asInstanceOf[Map[String, Any]]
    def metaInt(k: String): Int = meta0.getOrElse(k,
      sys.error(s"mmdb: metadata missing $k")).asInstanceOf[Long].toInt
    val meta = Meta(metaInt("node_count"), metaInt("record_size"), metaInt("ip_version"))
    require(Set(24, 28, 32).contains(meta.recordSize),
      s"mmdb: unsupported record_size ${meta.recordSize}")
    val nodeBytes = meta.recordSize / 4 // 2 records of record_size BITS each
    val treeSize = meta.nodeCount * nodeBytes
    val dataBase = treeSize + 16 // 16-byte zero separator
    val dec = new Decoder(bytes, dataBase)

    def record(node: Int, side: Int): Int = {
      val off = node * nodeBytes
      meta.recordSize match {
        case 24 => (((bytes(off + side * 3) & 0xff) << 16) |
          ((bytes(off + side * 3 + 1) & 0xff) << 8) | (bytes(off + side * 3 + 2) & 0xff))
        case 32 => ((bytes(off + side * 4) & 0xff) << 24 |
          (bytes(off + side * 4 + 1) & 0xff) << 16 |
          (bytes(off + side * 4 + 2) & 0xff) << 8 | (bytes(off + side * 4 + 3) & 0xff))
        case 28 =>
          if (side == 0)
            ((bytes(off + 3) & 0xf0) << 20) | ((bytes(off) & 0xff) << 16) |
              ((bytes(off + 1) & 0xff) << 8) | (bytes(off + 2) & 0xff)
          else
            ((bytes(off + 3) & 0x0f) << 24) | ((bytes(off + 4) & 0xff) << 16) |
              ((bytes(off + 5) & 0xff) << 8) | (bytes(off + 6) & 0xff)
      }
    }

    def dataAt(rec: Int): Map[String, String] = {
      // record > node_count → data: offset = rec - node_count - 16 from the
      // data section start (the separator is part of the address space)
      val v = dec.decode(dataBase + (rec - meta.nodeCount - 16))._1
      val out = scala.collection.mutable.Map.empty[String, String]
      flatten(v, "", out)
      out.toMap
    }

    // v6 trees keep IPv4 under 96 leading zero bits; a data record hit on the
    // way down means some ::/k range covers all of v4 — emit it as 0..2^32-1
    var root = 0
    if (meta.ipVersion == 6) {
      var depth = 0
      while (depth < 96 && root < meta.nodeCount) {
        root = record(root, 0)
        depth += 1
      }
      if (root == meta.nodeCount) return Nil // empty v4 space
      if (root > meta.nodeCount)
        return Seq(IpRange(0L, (1L << 32) - 1, dataAt(root)))
    }

    val out = Seq.newBuilder[IpRange]
    def walk(node: Int, lo: Long, depth: Int): Unit = {
      // a node at depth d spawns children at d+1; leaves cap at 32 bits, so
      // a NODE at depth 32 is already malformed (its leaves would be 33-bit
      // prefixes — and the span math would emit inverted hi < lo ranges)
      if (depth >= 32) sys.error("mmdb: tree deeper than 32 bits in the v4 plane")
      val span = 1L << (32 - depth)
      var side = 0
      while (side < 2) {
        val childLo = lo + side * (span >> 1)
        val rec = record(node, side)
        if (rec < meta.nodeCount) walk(rec, childLo, depth + 1)
        else if (rec > meta.nodeCount)
          out += IpRange(childLo, childLo + (span >> 1) - 1, dataAt(rec))
        side += 1 // rec == node_count → no data, gap
      }
    }
    if (root < meta.nodeCount) walk(root, 0L, 0)
    // merge adjacent leaves with identical values (tree alignment splits
    // one logical CIDR into many aligned blocks)
    out.result().sortBy(_.lo).foldLeft(List.empty[IpRange]) {
      case (acc @ (prev :: rest), r) if prev.hi + 1 == r.lo && prev.values == r.values =>
        prev.copy(hi = r.hi) :: rest
      case (acc, r) => r :: acc
    }.reverse
  }

  /** Read `path` (driver-side, through the session's Hadoop filesystem) into
    * a `(range_lo, range_hi, <flattened attribute columns>)` DataFrame ready
    * for [[graft.ops.Contexts.enrichRange]]. `fields` restricts/orders the
    * attribute columns; default = union of keys across records, sorted.
    */
  def readRanges(spark: SparkSession, path: String, fields: Seq[String] = Nil): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val len = fs.getFileStatus(p).getLen
    require(len <= (1L << 31) - 1, s"mmdb: $path too large to load driver-side")
    val bytes = new Array[Byte](len.toInt)
    val in = fs.open(p)
    try in.readFully(0, bytes) finally in.close()
    toDf(spark, parseRanges(bytes), fields)
  }

  // ---------------------------------------------------------------- encode

  /** Build a minimal spec-conformant mmdb image from IPv4 CIDRs (record_size
    * 24; `ipVersion = 6` places the v4 tree under the standard 96-zero-bit
    * prefix). Nested networks are handled by splitting the covering leaf
    * (most-specific wins, as in real GeoLite2 builds). Deterministic — used
    * to synthesize fixtures for specs and the q_geoip oracle (no real
    * GeoLite2 file ships in this environment).
    */
  def encode(networks: Seq[(String, Map[String, String])], ipVersion: Int = 4): Array[Byte] = {
    import scala.collection.mutable.ArrayBuffer
    val data = new java.io.ByteArrayOutputStream()
    def encStr(s: String): Unit = {
      val b = s.getBytes(StandardCharsets.UTF_8)
      require(b.length < 29, s"mmdb encode: string too long: $s")
      data.write((2 << 5) | b.length); data.write(b)
    }
    def encUint(ty: Int, v: Long): Unit = {
      val b = BigInt(v).toByteArray.dropWhile(_ == 0)
      data.write((ty << 5) | b.length); data.write(b)
    }
    def encMapHeader(n: Int): Unit = { require(n < 29); data.write((7 << 5) | n) }

    val offsets = networks.map { case (_, m) =>
      val off = data.size()
      encMapHeader(m.size)
      m.toSeq.sortBy(_._1).foreach { case (k, v) => encStr(k); encStr(v) }
      off
    }

    sealed trait Rec
    case object Empty extends Rec
    case class Node(i: Int) extends Rec
    case class Data(off: Int) extends Rec
    val recs = ArrayBuffer[Array[Rec]](Array[Rec](Empty, Empty))
    def newNode(): Int = { recs += Array[Rec](Empty, Empty); recs.size - 1 }

    def bitsOf(cidr: String): Seq[Int] = {
      val Array(ip, lenS) = cidr.split('/')
      val len = lenS.toInt
      val base = ip.split('.').map(_.toLong).reduce((a, b) => (a << 8) | b)
      val v4 = (31 to (32 - len) by -1).map(b => ((base >> b) & 1L).toInt)
      if (ipVersion == 6) Seq.fill(96)(0) ++ v4 else v4
    }

    // insert covering networks first so a longer prefix always lands on an
    // Empty slot or splits a covering Data leaf
    networks.map(_._1).zip(offsets)
      .sortBy { case (cidr, _) => cidr.split('/')(1).toInt }
      .foreach { case (cidr, off) =>
        val bits = bitsOf(cidr)
        var node = 0
        bits.zipWithIndex.foreach { case (b, i) =>
          if (i == bits.length - 1) recs(node)(b) = Data(off)
          else recs(node)(b) match {
            case Node(n) => node = n
            case Empty => val n = newNode(); recs(node)(b) = Node(n); node = n
            case Data(d) => // split the covering leaf: both children inherit
              val n = newNode()
              recs(n)(0) = Data(d); recs(n)(1) = Data(d)
              recs(node)(b) = Node(n); node = n
          }
        }
      }

    val nodeCount = recs.size
    // every record value — node index, the no-data sentinel (nodeCount), or
    // a data pointer (nodeCount + 16 + offset) — must fit the fixed 24-bit
    // record width; fail loudly instead of silently truncating high bits
    // into a corrupt image
    require(nodeCount + 16 + data.size() < (1 << 24),
      s"mmdb encode: image exceeds 24-bit record range " +
        s"(nodes=$nodeCount, data=${data.size()} bytes)")
    val out = new java.io.ByteArrayOutputStream()
    def rec24(r: Rec): Int = r match {
      case Empty => nodeCount
      case Node(i) => i
      case Data(off) => nodeCount + 16 + off
    }
    recs.foreach { pair =>
      pair.foreach { r =>
        val v = rec24(r)
        out.write((v >> 16) & 0xff); out.write((v >> 8) & 0xff); out.write(v & 0xff)
      }
    }
    out.write(new Array[Byte](16)) // data-section separator
    data.writeTo(out)
    out.write(MetaMarker)
    // metadata map (its own decoder base is irrelevant — no pointers)
    val metaEntries = Seq[(String, () => Unit)](
      "binary_format_major_version" -> (() => encUint(5, 2)),
      "binary_format_minor_version" -> (() => encUint(5, 0)),
      "database_type" -> (() => encStr("graft-test")),
      "ip_version" -> (() => encUint(5, ipVersion.toLong)),
      "node_count" -> (() => encUint(6, nodeCount.toLong)),
      "record_size" -> (() => encUint(5, 24)))
    val metaStart = data.size()
    encMapHeader(metaEntries.size)
    metaEntries.foreach { case (k, enc) => encStr(k); enc() }
    // the metadata bytes were appended to `data`; copy just that tail
    val all = data.toByteArray
    out.write(all, metaStart, all.length - metaStart)
    out.toByteArray
  }

  /** DataFrame form of pre-parsed ranges (see [[parseRanges]]). */
  def toDf(spark: SparkSession, ranges: Seq[IpRange], fields: Seq[String] = Nil): DataFrame = {
    val cols =
      if (fields.nonEmpty) fields
      else ranges.flatMap(_.values.keys).distinct.sorted
    val schema = StructType(
      StructField("range_lo", LongType, nullable = false) +:
      StructField("range_hi", LongType, nullable = false) +:
      cols.map(c => StructField(c, StringType, nullable = true)))
    val rows = ranges.map(r =>
      Row.fromSeq(r.lo +: r.hi +: cols.map(c => r.values.get(c).orNull)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }
}
