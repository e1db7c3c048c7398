package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Multimodal.syntheticMedia(spark, 30)

  test("decodeMeta parses every blob's header (schema + batch plumbing)") {
    val dec = Multimodal.decodeMeta(media)
    assert(dec.count() == 30)
    val kinds = dec.select("kind").distinct().as[String].collect().toSet
    assert(kinds == Set("image", "audio", "video"))
    // images/audio are single-frame; only video carries frame counts
    assert(dec.filter(col("kind") =!= "video" && col("n_frames") =!= 1).count() == 0)
    assert(dec.filter(col("kind") === "audio" && col("sample_rate") =!= 16000).count() == 0)
  }

  test("sampleFrames emits one row per every-Nth frame, only for video") {
    val dec = Multimodal.decodeMeta(media)
    val frames = Multimodal.sampleFrames(dec, everyN = 12)
    val expected = dec.filter(col("kind") === "video")
      .select((floor((col("n_frames") - 1) / 12) + 1).as("k"))
      .agg(sum("k")).as[Long].head()
    assert(frames.count() == expected)
  }

  test("resizePlan preserves aspect ratio and caps the long side") {
    val out = Multimodal.resizePlan(Multimodal.decodeMeta(media), maxSide = 64)
    assert(out.filter(col("target_w") > 64 || col("target_h") > 64).count() == 0)
    // no upscaling: blobs smaller than the cap keep their dims
    assert(out.filter(col("width") <= 64 && col("height") <= 64 &&
      (col("target_w") =!= col("width") || col("target_h") =!= col("height")))
      .count() == 0)
  }

  test("payloadDedup groups identical content bytes across distinct headers") {
    val out = Multimodal.payloadDedup(Multimodal.syntheticMedia(spark, 250))
    // ids 100-199 and 200-249 duplicate payload seeds 0-99 / 0-49
    assert(out.count() == 250)
    assert(out.filter(col("is_dup") === 1).count() == 150)
    val g = out.filter(col("media_id") === 137).select("canonical_id")
      .collect().head.getLong(0)
    assert(g == 37)
  }

  test("extractFeatures is deterministic and fixed-width") {
    val f1 = Multimodal.extractFeatures(media).as[(Long, Seq[Float])].collect().toMap
    val f2 = Multimodal.extractFeatures(media).as[(Long, Seq[Float])].collect().toMap
    assert(f1 == f2)
    assert(f1.values.forall(_.length == 8))
  }
}
