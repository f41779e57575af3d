package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.formats.{Codec, JsonStreams}

/** In-pipeline compression codecs + the JSON-dialect stream readers
  * (GELF / Suricata EVE / Zeek-JSON).
  */
class CodecStreamsSpec extends SparkSpec {
  import spark.implicits._

  private val samples = Seq(
    "hello codec world",
    "", // empty payload must round-trip to empty
    "a" * 10000, // compressible
    "{\"nested\": [1, 2, 3], \"s\": \"é漢\"}" // multibyte UTF-8
  )

  test("all codecs round-trip byte-identically, null propagates") {
    val df = samples.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "s")
      .withColumn("b", col("s").cast("binary"))
      .union(Seq((99L, null.asInstanceOf[String])).toDF("id", "s")
        .withColumn("b", col("s").cast("binary")))
    for (c <- Codec.Codecs) {
      val rt = df.select(col("id"), col("s"),
        Codec.decompress(Codec.compress(col("b"), c), c).cast("string").as("rt"))
      val rows = rt.collect()
      assert(rows.length == samples.length + 1, c)
      rows.foreach { r =>
        assert(r.getAs[String]("rt") == r.getAs[String]("s"),
          s"codec $c mismatch on id=${r.getLong(0)}")
      }
    }
  }

  test("compressed bytes carry the spec magic numbers") {
    val df = Seq(("x" * 4096)).toDF("s").withColumn("b", col("s").cast("binary"))
    def first(c: String): Array[Byte] =
      df.select(Codec.compress(col("b"), c)).head().getAs[Array[Byte]](0)
    val gz = first("gzip");  assert((gz(0) & 0xff) == 0x1f && (gz(1) & 0xff) == 0x8b)
    val bz = first("bz2");   assert(bz(0) == 'B' && bz(1) == 'Z' && bz(2) == 'h')
    val zs = first("zstd");  assert((zs(0) & 0xff) == 0x28 && (zs(1) & 0xff) == 0xb5)
    val lz = first("lz4");   assert((lz(0) & 0xff) == 0x04 && (lz(1) & 0xff) == 0x22)
    // repetitive input must actually shrink
    for (c <- Codec.Codecs) assert(first(c).length < 4096, s"$c did not compress")
  }

  test("unknown codec is rejected eagerly") {
    intercept[IllegalArgumentException](Codec.compress(lit("x").cast("binary"), "brotli"))
    intercept[IllegalArgumentException](Codec.decompress(lit("x").cast("binary"), "nope"))
  }

  test("readGelf explodes NUL-delimited frames and keeps custom underscore fields") {
    val f1 = """{"version":"1.1","host":"web1","short_message":"up","_tenant":"a"}"""
    val f2 = """{"version":"1.1","host":"web2","short_message":"down","_tenant":"b"}"""
    val f3 = """{"version":"1.1","host":"web3","short_message":"up","_tenant":"c"}"""
    val NUL = 0.toChar.toString // GELF TCP frame delimiter
    val df = Seq((1L, f1 + NUL + f2 + NUL), (2L, f3))
      .toDF("chunk_id", "chunk")
    val out = JsonStreams.readGelf(df, "chunk")
    val rows = out.select(col("chunk_id"), col("parsed.host"),
      col("parsed.short_message"), col("parsed._tenant"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
      .sortBy(_._2)
    assert(rows.toSeq == Seq(
      (1L, "web1", "up", "a"), (1L, "web2", "down", "b"), (2L, "web3", "up", "c")))
  }

  test("readSuricata routes per event_type with per-route inferred schemas") {
    val alert = """{"event_type":"alert","src_ip":"10.0.0.1","alert":{"signature_id":2019401,"severity":3}}"""
    val flow = """{"event_type":"flow","src_ip":"10.0.0.2","flow":{"bytes_toserver":1024}}"""
    val df = Seq(alert, flow, alert).toDF("line")
    val routes = JsonStreams.readSuricata(df, "line")
    assert(routes.keySet == Set("alert", "flow"))
    val a = routes("alert")
    assert(a.count() == 2)
    assert(a.select(col("parsed.alert.severity")).head().getLong(0) == 3L)
    // the flow route's schema must NOT contain the alert struct
    val flowFields = routes("flow").select("parsed.*").columns.toSet
    assert(flowFields.contains("flow") && !flowFields.contains("alert"))
  }

  test("readZeekJson routes by _path") {
    val conn = """{"_path":"conn","uid":"C1","orig_bytes":42}"""
    val dns = """{"_path":"dns","uid":"C2","query":"example.com"}"""
    val df = Seq(conn, dns).toDF("line")
    val routes = JsonStreams.readZeekJson(df, "line")
    assert(routes.keySet == Set("conn", "dns"))
    assert(routes("conn").select(col("parsed.orig_bytes")).head().getLong(0) == 42L)
    assert(routes("dns").select(col("parsed.query")).head().getString(0) == "example.com")
  }
}
