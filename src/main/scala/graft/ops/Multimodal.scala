package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video payloads ride through the engine as
  * opaque `binary` columns plus typed metadata, exactly like `html: binary`
  * in the CDC page table. The Spark-side plumbing — schema, batched decode
  * shape, partition sizing — is real, and so is the image path:
  * [[realCodec]] decodes PNG/JPEG/GIF/BMP with the JDK's ImageIO.
  * Audio/video have no in-container codec, so [[FakeCodec]] remains the
  * deterministic oracle-checkable stand-in for cross-modality pipelines.
  *
  * Design for 100 TB: media bytes never pass through a shuffle — decode and
  * feature-extraction are narrow per-partition maps; only the (small) derived
  * features ever become join/agg keys. Partition sizing is controlled by the
  * source (`maxPartitionBytes`), not by row count, because rows are megabytes.
  */
object Multimodal {

  /** Typed metadata carried beside every media payload. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("byte_len", LongType),
    StructField("content_hash", LongType)))

  /** Decoded-frame features produced by the (stubbed) decoder. */
  case class MediaFeatures(
      width: Int, height: Int, channels: Int, n_frames: Int, feat_hash: Long)

  case class MediaRow(id: Long, mime: String, bytes: Array[Byte])
  case class DecodedRow(id: Long, mime: String, byte_len: Long,
      width: Int, height: Int, channels: Int, n_frames: Int, feat_hash: Long)

  /** Column-level metadata extraction — pure Catalyst, no decode needed. */
  def withMediaMeta(df: DataFrame, bytesCol: String, mimeCol: Column): DataFrame =
    df.withColumn("media_meta", struct(
      mimeCol.as("mime"),
      octet_length(col(bytesCol)).cast("long").as("byte_len"),
      xxhash64(col(bytesCol)).as("content_hash")))

  /** Real image decode via the JDK's ImageIO (PNG/JPEG/GIF/BMP ship with
    * every JVM — no external codec needed): dimensions and channel count
    * from the decoded raster, `feat_hash` = md5h60 over the row-major ARGB
    * pixel stream (layout-independent — `getRGB` normalizes whatever raster
    * the decoder produced, so the digest is stable across decoders).
    * Audio/video still have no in-container codec: those MIME types fail
    * loudly rather than fake a decode — swap a libav-backed batch fn with
    * the same signature for them in production ([[decodeBatched]] takes any
    * codec, and [[FakeCodec]] remains the deterministic stand-in the
    * cross-modality oracle queries use).
    */
  /** Guarded in-memory decode shared by [[realCodec]] and [[imageStats]]:
    * mime check, then ImageIO over a MemoryCacheImageInputStream — the
    * default `ImageIO.read(InputStream)` spools through a temp FILE in
    * java.io.tmpdir (useCache=true), needless disk I/O per image when the
    * bytes are already in memory.
    */
  private def decodeImage(r: MediaRow): java.awt.image.BufferedImage = {
    require(r.mime != null && r.mime.startsWith("image/"),
      s"no in-container codec for mime '${r.mime}' (JDK ImageIO decodes images only)")
    val in = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(r.bytes))
    // ImageIO.read(ImageInputStream) closes the stream itself (unlike the
    // InputStream overload) — closing again throws
    val img = javax.imageio.ImageIO.read(in)
    require(img != null, s"undecodable image payload (mime '${r.mime}')")
    img
  }

  def realCodec(batch: Seq[MediaRow]): Seq[MediaFeatures] = batch.map { r =>
    val img = decodeImage(r)
    val (w, h) = (img.getWidth, img.getHeight)
    val md = java.security.MessageDigest.getInstance("MD5")
    val row = new Array[Int](w)
    val buf = java.nio.ByteBuffer.allocate(4 * w)
    var y = 0
    while (y < h) {
      img.getRGB(0, y, w, 1, row, 0, w) // bulk row read, not w point calls
      buf.clear()
      var x = 0
      while (x < w) { buf.putInt(row(x)); x += 1 }
      md.update(buf.array(), 0, 4 * w)
      y += 1
    }
    MediaFeatures(w, h, img.getRaster.getNumBands, 1, md5h60Tail(md.digest()))
  }

  /** Per-channel mean pixel stats — the "feature extraction" step over a
    * decoded image (means over the `getRGB`-normalized 8-bit channels).
    */
  case class ImageStatsRow(id: Long, width: Int, height: Int, channels: Int,
      mean_r: Double, mean_g: Double, mean_b: Double)

  /** Batched real-image decode + channel stats: same narrow per-partition
    * shape as [[decodeBatched]] (no shuffle; media bytes never leave the
    * partition — only the small stat rows do).
    */
  def imageStats(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[ImageStatsRow] = {
    implicit val enc = Encoders.product[ImageStatsRow]
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val img = decodeImage(r)
          val (w, h) = (img.getWidth, img.getHeight)
          val row = new Array[Int](w)
          var (sr, sg, sb) = (0L, 0L, 0L)
          var y = 0
          while (y < h) {
            img.getRGB(0, y, w, 1, row, 0, w)
            var x = 0
            while (x < w) {
              val p = row(x)
              sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
              x += 1
            }
            y += 1
          }
          val n = w.toLong * h
          ImageStatsRow(r.id, w, h, img.getRaster.getNumBands,
            sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
        }
      }
    }
  }

  /** Deterministic PNG fixture: a `(8 + id%16) × (8 + id%8)` image filled
    * with the constant color `((id·37)%256, (id·57)%256, (id·77)%256)` —
    * arithmetic a SQL oracle can reproduce, so decoding it end-to-end
    * verifies the real codec (wrong decode ⇒ wrong dims/means).
    */
  def synthPng(id: Long): Array[Byte] = {
    val w = 8 + (id % 16).toInt
    val h = 8 + (id % 8).toInt
    val rgb = ((id * 37) % 256).toInt << 16 | ((id * 57) % 256).toInt << 8 |
      ((id * 77) % 256).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Long of the first 15 hex chars of an md5 digest (the md5h60 family —
    * [[graft.functions.Text.md5h60]]'s JVM twin on a raw digest).
    */
  private def md5h60Tail(d: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xf0L) >> 4)
  }

  /** Deterministic stand-in codec: derives plausible dimensions/frame counts
    * from the byte content alone. Same cost shape as a real decoder: touches
    * every byte once (the hash), emits fixed-size features. The hash is the
    * low-60-bit md5 (same family as
    * [[graft.functions.Text.md5h60]]) so the whole decode pipeline is
    * DuckDB-oracle-checkable.
    */
  object FakeCodec extends (Seq[MediaRow] => Seq[MediaFeatures]) with Serializable {
    /** JVM twin of Text.md5h60: long of the first 15 hex chars of md5. */
    def md5h60(bytes: Array[Byte]): Long = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
      // first 15 hex chars = first 7 bytes + high nibble of byte 8
      var v = 0L
      var i = 0
      while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
      (v << 4) | ((d(7) & 0xf0L) >> 4)
    }
    def apply(batch: Seq[MediaRow]): Seq[MediaFeatures] = batch.map { r =>
      val h = if (r.bytes == null) 0L else md5h60(r.bytes)
      val isVideo = r.mime.startsWith("video/")
      MediaFeatures(
        width = 64 + (Math.floorMod(h, 16L) * 64L).toInt,
        height = 64 + (Math.floorMod(h >>> 8, 16L) * 64L).toInt,
        channels = if (r.mime.startsWith("audio/")) 1 else 3,
        n_frames = if (isVideo) 1 + Math.floorMod(h >>> 16, 300L).toInt else 1,
        feat_hash = h)
    }
  }

  /** Batched decode over partitions: the Scala analogue of `mapInPandas` —
    * the iterator is chunked into `batchSize` groups so a vectorized/native
    * codec amortizes per-call overhead, while staying fully streaming (no
    * partition-sized materialization). Narrow op: no shuffle.
    */
  def decodeBatched(
      media: Dataset[MediaRow],
      codec: Seq[MediaRow] => Seq[MediaFeatures],
      batchSize: Int = 64): Dataset[DecodedRow] = {
    implicit val enc = Encoders.product[DecodedRow]
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        codec(batch).lazyZip(batch).map { (f, r) =>
          DecodedRow(r.id, r.mime, if (r.bytes == null) 0L else r.bytes.length.toLong,
            f.width, f.height, f.channels, f.n_frames, f.feat_hash)
        }
      }
    }
  }

  /** Deterministic frame sampling for video payloads: every `stride`-th frame
    * index up to `n_frames` — the downstream contract a real frame extractor
    * fills with pixels. Emits one row per sampled frame (explode — narrow).
    */
  def sampleFrames(decoded: DataFrame, stride: Int): DataFrame =
    decoded.withColumn("frame",
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))))
      // universal-hash mix of (feat_hash, frame) — overflow-free 63-bit
      // arithmetic, so DuckDB computes the identical value (xxhash64 has no
      // SQL twin)
      .withColumn("frame_hash",
        pmod(lit(48271L) * shiftrightunsigned(col("feat_hash"), 30) +
          lit(16807L) * col("feat_hash").bitwiseAND(lit((1L << 30) - 1)) +
          col("frame"), lit(2147483647L)))

  /** "Resize" feature metadata: pure arithmetic on decoded dims (a real
    * implementation rescales pixels; the plan shape is identical).
    */
  def resizeMeta(decoded: DataFrame, maxDim: Int): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxDim).cast("double") / greatest(col("width"), col("height")).cast("double"))
    decoded
      .withColumn("out_width", floor(col("width") * scale).cast("int"))
      .withColumn("out_height", floor(col("height") * scale).cast("int"))
  }
}
