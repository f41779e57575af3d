package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video payloads ride through the engine as
  * opaque `binary` columns plus typed metadata, exactly like `html: binary`
  * in the CDC page table. The Spark-side plumbing — schema, batched decode
  * shape, partition sizing — is real; the codec itself is stubbed behind
  * [[FakeCodec]] (no image/audio libs in this container) with the production
  * entry point left as an unimplemented hook.
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

  /** PRODUCTION HOOK: decode a batch of media payloads with a native codec
    * (libjpeg/ffmpeg/…). Deliberately unimplemented in this container — the
    * sandbox has no media libraries. Swap in a real implementation with the
    * same signature; everything around it (batching, schema, partitioning)
    * is already wired and tested against [[FakeCodec]].
    */
  def realCodec(batch: Seq[MediaRow]): Seq[MediaFeatures] = ???

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
