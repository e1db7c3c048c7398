package graft

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.MediaRow
import graft.queries.Breadth50

/** Closed-form fixtures for the fifty-first wave (Breadth50 perceptual
  * media hashing). */
class Wave50Spec extends SparkSpec {
  import spark.implicits._

  test("blockHash: a half-bright payload sets exactly the bright " +
    "blocks' bits") {
    // 16 header bytes (ignored) + 32 payload bytes: 16×0xFF then 16×0x00
    val bytes = Array.fill[Byte](16)(0) ++
      Array.fill[Byte](16)(0xFF.toByte) ++ Array.fill[Byte](16)(0)
    val got = Multimodal.blockHash(
        Seq(MediaRow(1L, "image", bytes)).toDS(), blocks = 16)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(got === Seq((1L, 0xFFL)))
  }

  test("pigeonhole bands: every hash pair within hamming 2 shares at " +
    "least one intact band — candidate generation is complete") {
    def bands(h: Long): Seq[Long] =
      Breadth50.PhashBands.map { case (off, mask) => (h >> off) & mask }
    val rnd = new scala.util.Random(7)
    (0 until 200).foreach { _ =>
      val x = rnd.nextLong() & 0xFFFFL
      for (i <- 0 until 16; j <- i until 16) {
        val y = x ^ (1L << i) ^ (if (j == i) 0L else 1L << j)
        assert(bands(x).zip(bands(y)).exists(p => p._1 == p._2),
          f"no intact band for x=$x%04x y=$y%04x")
      }
    }
  }

  test("phashNearDups: finds the hamming-1 pair, skips the far hash " +
    "and the cross-kind pair") {
    val h = Seq((1L, "image", 1L), (2L, "image", 3L),
        (3L, "image", 0xFFFFL), (4L, "audio", 1L))
      .toDF("media_id", "kind", "phash")
    val got = Breadth50.phashNearDups(h)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getInt(3))).toSeq
    assert(got === Seq(("image", 1L, 2L, 1)))
  }
}
