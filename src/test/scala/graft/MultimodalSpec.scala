package graft

import org.apache.spark.sql.functions._

import graft.ops.Multimodal
import graft.ops.Multimodal.{MediaRow, FakeCodec}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = (0 until 100).map { i =>
    val mime = i % 3 match {
      case 0 => "image/jpeg"; case 1 => "audio/wav"; case 2 => "video/mp4"
    }
    MediaRow(i.toLong, mime, s"payload-$i-${"x" * (i % 17)}".getBytes("UTF-8"))
  }.toDS()

  test("withMediaMeta derives typed metadata without decoding") {
    val out = Multimodal.withMediaMeta(media.toDF(), "bytes", col("mime"))
    val r = out.filter(col("id") === 5).select("media_meta.*").head()
    assert(r.getAs[String]("mime") == "video/mp4")
    assert(r.getAs[Long]("byte_len") == media.filter(col("id") === 5).head().bytes.length.toLong)
  }

  test("decodeBatched is deterministic, preserves ids, honors batch shape") {
    val d1 = Multimodal.decodeBatched(media, FakeCodec, batchSize = 7).collect().sortBy(_.id)
    val d2 = Multimodal.decodeBatched(media, FakeCodec, batchSize = 64).collect().sortBy(_.id)
    assert(d1.toSeq == d2.toSeq) // batch size must not affect results
    assert(d1.map(_.id).toSeq == (0L until 100L))
    assert(d1.forall(r => r.width >= 64 && r.height >= 64))
    assert(d1.filter(_.mime == "audio/wav").forall(_.channels == 1))
    assert(d1.filter(_.mime != "video/mp4").forall(_.n_frames == 1))
    // codec sees batches of the requested size (last may be short);
    // closure runs on executors → collect sizes via an accumulator
    val sizes = spark.sparkContext.collectionAccumulator[Int]("batchSizes")
    val counting = (b: Seq[MediaRow]) => { sizes.add(b.size); FakeCodec(b) }
    Multimodal.decodeBatched(media.repartition(1), counting, batchSize = 30).count()
    import scala.jdk.CollectionConverters._
    assert(sizes.value.asScala.toList.sorted == List(10, 30, 30, 30))
  }

  test("realCodec decodes PNGs with ImageIO: exact dims, channels, stable hash") {
    // synthPng(id): (8 + id%16) × (8 + id%8), constant fill from id
    val imgs = Seq(0L, 5L, 13L, 250L).map(id =>
      MediaRow(id, "image/png", Multimodal.synthPng(id)))
    val feats = Multimodal.realCodec(imgs)
    imgs.zip(feats).foreach { case (r, f) =>
      assert(f.width == 8 + (r.id % 16).toInt && f.height == 8 + (r.id % 8).toInt)
      assert(f.channels == 3 && f.n_frames == 1)
    }
    // pixel digest is deterministic across decode calls
    assert(Multimodal.realCodec(imgs).map(_.feat_hash) == feats.map(_.feat_hash))
    // different content ⇒ different digest
    assert(feats.map(_.feat_hash).distinct.size == feats.size)
    // non-image mime fails loudly (no in-container audio/video codec)
    val err = intercept[IllegalArgumentException](
      Multimodal.realCodec(Seq(MediaRow(1L, "video/mp4", Array[Byte](1, 2)))))
    assert(err.getMessage.contains("codec"))
    // garbage bytes under an image mime fail loudly too
    intercept[IllegalArgumentException](
      Multimodal.realCodec(Seq(MediaRow(1L, "image/png", Array[Byte](9, 9, 9)))))
    // distributed end-to-end through the batched mapPartitions + stats path
    val ds = imgs.toDS().repartition(2)
    val decoded = Multimodal.decodeBatched(ds, Multimodal.realCodec _)
      .collect().sortBy(_.id)
    assert(decoded.map(r => (r.id, r.width, r.height)).toSeq ==
      imgs.map(r => (r.id, 8 + (r.id % 16).toInt, 8 + (r.id % 8).toInt)))
    val stats = Multimodal.imageStats(ds).collect().sortBy(_.id)
    stats.foreach { s =>
      assert(s.mean_r == ((s.id * 37) % 256).toDouble, s"id=${s.id}")
      assert(s.mean_g == ((s.id * 57) % 256).toDouble)
      assert(s.mean_b == ((s.id * 77) % 256).toDouble)
    }
  }

  test("frame sampling + resize metadata pipeline") {
    val decoded = Multimodal.decodeBatched(media, FakeCodec).toDF()
    val frames = Multimodal.sampleFrames(decoded, stride = 30)
    // every video contributes ceil(n_frames/30) frames, others exactly 1
    val perDoc = frames.groupBy("id", "mime", "n_frames").count().collect()
    perDoc.foreach { r =>
      val expected = (r.getAs[Int]("n_frames") + 29) / 30
      assert(r.getAs[Long]("count") == expected.toLong, s"id=${r.getAs[Long]("id")}")
    }
    val resized = Multimodal.resizeMeta(frames, maxDim = 128)
    resized.select("out_width", "out_height").as[(Int, Int)].collect().foreach { case (w, h) =>
      assert(w <= 128 && h <= 128 && w > 0 && h > 0)
    }
  }
}
