package graft

import graft.queries.Breadth107

/** Closed-form fixture for the hundred-eighth wave (Breadth107
  * centroid-proxy hard negatives). */
class Wave112Spec extends SparkSpec {
  import spark.implicits._

  test("hardNegatives ranks each vector against OTHER-label centroids") {
    // label 1 along x, label 2 along y, label 3 split between them —
    // the label-3 vector pointing at x should name label 1 its hardest
    // negative with proxy_cos ≈ 1.
    val emb = Seq(
      (1L, 1, Array(1.0f, 0.0f)), (2L, 1, Array(1.0f, 0.0f)),
      (10L, 2, Array(0.0f, 1.0f)), (11L, 2, Array(0.0f, 1.0f)),
      (20L, 3, Array(1.0f, 0.0f)), (21L, 3, Array(0.0f, 1.0f)))
      .toDF("vec_id", "label", "embedding")
    val got = Breadth107.hardNegatives(emb, k = 6)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getDouble(3))).toSeq
    val m = got.map(t => t._1 -> (t._3, t._4)).toMap
    assert(m(20L)._1 === 1 && math.abs(m(20L)._2 - 1.0) < 2e-6)
    assert(m(21L)._1 === 2 && math.abs(m(21L)._2 - 1.0) < 2e-6)
    // a pure label-1 vector is orthogonal to label 2's centroid but
    // half-aligned with label 3's mixed centroid
    assert(m(1L)._1 === 3)
  }
}
