package graft

import java.nio.ByteBuffer
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.formats.{Bitz, Feather}

/** Feather v2 (Arrow IPC file) + BITZ framed-IPC formats: full-type
  * roundtrips, schema inference from footers, frame-level wire layout, and
  * the reference's error diagnostics (bitz.cpp:46-88).
  */
class FeatherBitzSpec extends SparkSpec {

  /** Rich typed fixture: every family the reference's Arrow engine moves —
    * integers, floats, strings, bools, binary, date, NTZ+LTZ timestamps,
    * decimal, array, struct, map, nulls.
    */
  private def fixture(n: Int): DataFrame =
    spark.range(n.toLong).selectExpr(
      "id",
      "cast(id as int) as i",
      "cast(id as double)/7 as d",
      "concat('s', id) as s",
      "id % 3 = 0 as b",
      "cast(concat('b', id) as binary) as bin",
      "date_add(date'2020-01-01', cast(id as int)) as dt",
      "timestamp_ntz'2021-06-01 00:00:00' + make_interval(0,0,0,0,0,0,id) as tsn",
      "timestamp'2021-06-01 00:00:00' + make_interval(0,0,0,0,0,0,id) as tsl",
      "cast(cast(id as decimal(12,2))/3 as decimal(12,2)) as dec",
      "array(concat('a', id), null) as arr",
      "named_struct('x', id, 'y', concat('y', id)) as st",
      "map(concat('k', id), id) as mp",
      "if(id % 10 = 0, null, concat('n', id)) as ns")

  /** Order-free value equality that covers binary/map/struct: canonical JSON
    * per row, sorted.
    */
  private def canon(df: DataFrame): Seq[String] = {
    import spark.implicits._
    df.select(to_json(struct(df.columns.map(col).toIndexedSeq: _*)))
      .as[String].collect().toSeq.sorted
  }

  test("feather roundtrip preserves every type family, schema inferred from footer") {
    val df = fixture(100).repartition(3)
    val dir = tmpDir("feather")
    val manifest = Feather.save(df, dir, batchRows = 16)
    assert(manifest.map(_._2).sum === 100L)
    assert(manifest.forall(_._1.endsWith(".feather")))
    val back = Feather.load(spark, dir)
    assert(back.schema === df.schema)
    assert(canon(back) === canon(df))
  }

  test("feather: empty partitions write no files; rows survive") {
    val df = fixture(3).repartition(8)
    val dir = tmpDir("feather-sparse")
    val manifest = Feather.save(df, dir)
    assert(manifest.size <= 3 && manifest.map(_._2).sum === 3L)
    assert(canon(Feather.load(spark, dir)) === canon(df))
  }

  test("bitz save/load roundtrip across partitions and frames") {
    val df = fixture(90).repartition(4)
    val dir = tmpDir("bitz")
    val manifest = Bitz.save(df, dir, batchRows = 11) // multiple frames per file
    assert(manifest.map(_._2).sum === 90L)
    val back = Bitz.load(spark, dir)
    assert(back.schema === df.schema)
    assert(canon(back) === canon(df))
  }

  test("bitz wire layout: TNZ1 magic + big-endian u64 length per frame") {
    val df = fixture(10).coalesce(1)
    val rows = df.collect().toSeq
    val bytes = Bitz.encode(rows, df.schema, batchRows = 4) // 3 frames
    assert(new String(bytes.take(4), "US-ASCII") === "TNZ1")
    val len0 = ByteBuffer.wrap(bytes, 4, 8).getLong
    assert(len0 > 0 && 12 + len0 < bytes.length) // more frames follow
    assert(new String(bytes.slice(12 + len0.toInt, 16 + len0.toInt), "US-ASCII") === "TNZ1")
    val back = Bitz.decode(bytes, df.schema)
    def k(r: org.apache.spark.sql.Row): String =
      r.toSeq.map { case b: Array[Byte] => b.toSeq; case x => x }.mkString("|")
    assert(back.map(k).sorted === rows.map(k).sorted)
  }

  test("bitz rejects bad magic and truncated frames") {
    val df = fixture(5).coalesce(1)
    val bytes = Bitz.encode(df.collect().toSeq, df.schema)
    val bad = bytes.clone(); bad(0) = 'X'.toByte
    val e1 = intercept[IllegalArgumentException](Bitz.decode(bad, df.schema))
    assert(e1.getMessage.contains("BITZ magic"))
    val e2 = intercept[IllegalArgumentException](
      Bitz.decode(bytes.take(bytes.length - 3), df.schema))
    assert(e2.getMessage.contains("message length"))
  }

  test("feather reads compressed record batches (lz4 + zstd write codecs)") {
    val df = fixture(200).repartition(2)
    for (codec <- Seq("lz4", "zstd")) {
      val dir = tmpDir(s"feather-$codec")
      Feather.save(df, dir, batchRows = 64, codec = codec)
      val back = Feather.load(spark, dir)
      assert(back.schema === df.schema)
      assert(canon(back) === canon(df), s"codec=$codec")
    }
  }

  test("bitz schema inference bounds-checks the first frame") {
    val df = fixture(5).coalesce(1)
    val dir = tmpDir("bitz-trunc")
    Bitz.save(df, dir)
    // truncate the single part file mid-payload: inference must fail with the
    // BITZ diagnostic, not an obscure Arrow footer error
    val listing = Files.list(Paths.get(dir))
    val f = try listing.findFirst().get finally listing.close()
    val bytes = Files.readAllBytes(f)
    Files.write(f, bytes.take(bytes.length / 2))
    val e = intercept[IllegalArgumentException](Bitz.load(spark, dir).schema)
    assert(e.getMessage.contains("message length"))
  }

  test("feather files carry the ARROW1 magic (true Feather v2 / IPC file format)") {
    val dir = tmpDir("feather-magic")
    Feather.save(fixture(5).coalesce(1), dir)
    val listing = Files.list(Paths.get(dir))
    val f = try listing.findFirst().get finally listing.close()
    val head = Files.readAllBytes(f).take(6)
    assert(new String(head, "US-ASCII") === "ARROW1")
  }
}
