package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` columns with
  * typed metadata, plus decode / feature-extract / resize / frame-sample
  * operators.
  *
  * The media codecs are NOT in this container, so the byte-level decode is
  * a clearly-marked STUB (`decodeHeader` parses graft's own deterministic
  * 16-byte header instead of JPEG/WAV/MP4). Everything AROUND the stub is
  * the real 100 TB design and is tested:
  *   - schema: (media_id, kind, bytes, plus decoded metadata struct);
  *   - partition-batched execution via `mapPartitions` — decoder init
  *     happens once per PARTITION, not per row (the same batch shape as
  *     Arrow-batched pandas UDFs in PySpark: amortized setup, columnar
  *     hand-off);
  *   - frame sampling as a generator (posexplode) so downstream ops see
  *     one row per sampled frame without materializing frames driver-side.
  */
object Multimodal {

  val Magic: Int = 0x47AF // "graft" fake container magic

  case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte])
  case class DecodedRow(media_id: Long, kind: String, width: Int, height: Int,
                        n_frames: Int, sample_rate: Int, payload_len: Int)

  /** Deterministic synthetic media: a 16-byte header
    * [magic:2][kindCode:1][width:2][height:2][nFrames:2][sampleRate:4][pad:3]
    * + a payload derived from media_id MOD 100 — so corpora larger than
    * 100 contain exact payload duplicates under distinct headers, the
    * shape binary dedup has to handle. Stands in for real
    * image/audio/video blobs. */
  def syntheticMedia(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { i =>
      val id = i
      val seed = id % 100 // payload identity — duplicated every 100 ids
      val kindCode = (id % 3).toInt // 0=image, 1=audio, 2=video
      val kind = Seq("image", "audio", "video")(kindCode)
      val width = 64 + (id % 8).toInt * 32
      val height = 64 + (id % 5).toInt * 32
      val nFrames = if (kindCode == 2) 24 + (id % 10).toInt * 12 else 1
      val sampleRate = if (kindCode == 1) 16000 else 0
      val payloadLen = 128 + (seed % 7).toInt * 64
      val buf = java.nio.ByteBuffer.allocate(16 + payloadLen)
      buf.putShort(Magic.toShort).put(kindCode.toByte)
        .putShort(width.toShort).putShort(height.toShort)
        .putShort(nFrames.toShort).putInt(sampleRate)
        .put(Array[Byte](0, 0, 0))
      (0 until payloadLen).foreach(j => buf.put(((seed * 31 + j * 7) % 251).toByte))
      MediaRow(id, kind, buf.array())
    }
  }

  /** Binary-payload exact dedup: fingerprint the content bytes (header
    * excluded — same pixels under different container metadata is still a
    * duplicate). Shares the canonical-id/group-size machinery with text
    * dedup (graft.dedup.Dedup.exactDupsBy). */
  def payloadDedup(media: Dataset[MediaRow]): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    graft.dedup.Dedup.exactDupsBy(media.toDF(), "media_id",
        md5(expr("substring(bytes, 17)")))
      .select("media_id", "fp", "canonical_id", "group_size", "is_dup")
  }

  /** STUB decode of one blob — parses graft's fake header. A real build
    * replaces ONLY this function body with an actual codec call (e.g.
    * javax.imageio / ffmpeg binding); the operator plumbing around it is
    * codec-agnostic. */
  private def decodeHeader(id: Long, kind: String, bytes: Array[Byte]): DecodedRow = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
    require((buf.getShort & 0xFFFF) == Magic, s"bad magic for media $id")
    buf.get() // kindCode — kind column is authoritative
    DecodedRow(id, kind, buf.getShort.toInt, buf.getShort.toInt,
      buf.getShort.toInt, buf.getInt, bytes.length - 16)
  }

  /** Decode metadata for every blob. `mapPartitions` so per-executor
    * decoder state initializes once per partition — the Scala analog of a
    * batched pandas UDF; rows stream through without per-row setup cost. */
  def decodeMeta(media: Dataset[MediaRow]): Dataset[DecodedRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder init would go here (stub: nothing to init)
      rows.map(r => decodeHeader(r.media_id, r.kind, r.bytes))
    }
  }

  /** Frame sampling for video rows: one output row per every-Nth frame
    * index — a generator (posexplode of a sequence), never a driver loop. */
  def sampleFrames(decoded: Dataset[DecodedRow], everyN: Int): DataFrame =
    decoded.toDF()
      .filter(col("kind") === "video")
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n_frames") - 1, lit(everyN))))
      .select("media_id", "frame_idx", "width", "height")

  /** Resize plan: metadata-level transform computing target dims with
    * preserved aspect ratio (the pixel work lives behind the stubbed
    * decode at scale-out time). */
  def resizePlan(decoded: Dataset[DecodedRow], maxSide: Int): DataFrame =
    decoded.toDF()
      .withColumn("scale",
        least(lit(1.0), lit(maxSide) / greatest(col("width"), col("height"))))
      .withColumn("target_w", ceil(col("width") * col("scale")).cast("int"))
      .withColumn("target_h", ceil(col("height") * col("scale")).cast("int"))
      .drop("scale")

  /** Block-mean perceptual hash of the payload (the aHash family): the
    * content bytes split into `blocks` equal runs, bit k set iff block
    * k's byte mean exceeds the whole-payload mean (stated as the
    * integer comparison blockSum·blocks > totalSum — no division, no
    * float). Container metadata is excluded like payloadDedup; similar
    * payloads (a few changed bytes) land within a small hamming radius
    * instead of breaking an exact fingerprint. Partition-batched like
    * decodeMeta. Payload lengths here are multiples of 64 so blocks
    * divide evenly; a real build pads the tail block. */
  def blockHash(media: Dataset[MediaRow], blocks: Int = 16): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val p = r.bytes.drop(16)
        val bs = p.length / blocks
        val sums = new Array[Long](blocks)
        var j = 0
        while (j < p.length) { sums(j / bs) += (p(j) & 0xFF).toLong; j += 1 }
        val total = sums.sum
        var h = 0L
        var k = 0
        while (k < blocks) {
          if (sums(k) * blocks > total) h |= 1L << k
          k += 1
        }
        (r.media_id, r.kind, h)
      }
    }.toDF("media_id", "kind", "phash")
  }

  /** STUB feature extraction: a deterministic 8-dim "embedding" from the
    * payload bytes (rolling-hash buckets) — stands in for a vision/audio
    * encoder. Partition-batched like decodeMeta. */
  def extractFeatures(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val f = new Array[Float](8)
        r.bytes.drop(16).zipWithIndex.foreach { case (b, i) =>
          f(i % 8) += (b & 0xFF) / 255.0f
        }
        val n = math.max(r.bytes.length - 16, 1)
        (r.media_id, f.map(v => v / n * 8))
      }
    }.toDF("media_id", "features")
  }
}
