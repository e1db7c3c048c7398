package graft

import graft.queries.Breadth116

/** Fixtures for the hundred-seventeenth wave (Breadth116 label purity /
  * simplified silhouette). */
class Wave122Spec extends SparkSpec {
  import spark.implicits._

  // labels 1 (x-axis) and 2 (y-axis) perfectly separated; label 3 sits
  // on x — its members' best-other centroid is label 1 at cosine ~1.
  private val emb = Seq(
    (1L, 1, Array(1.0f, 0.0f)), (2L, 1, Array(1.0f, 0.0f)),
    (10L, 2, Array(0.0f, 1.0f)), (11L, 2, Array(0.0f, 1.0f)),
    (20L, 3, Array(1.0f, 0.0f)), (21L, 3, Array(1.0f, 0.0f)))
    .toDF("vec_id", "label", "embedding")

  test("labelPurity: separated labels pure, the x-clone impure") {
    val got = Breadth116.labelPurity(emb)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
      .toSeq
    val m = got.map(t => t._1 -> t._3).toMap
    assert(m(2) === 1.0)                 // y-axis label: clean
    // labels 1 and 3 coincide — own vs other cosine ties at ~1, so
    // strict > fails: both impure (margin ~0)
    assert(m(1) === 0.0 && m(3) === 0.0)
  }

  test("silhouetteLite: clean label near +1, clones near 0") {
    val got = Breadth116.silhouetteLite(emb)
      .collect().map(r => (r.getInt(0), r.getDouble(2))).toSeq
    val m = got.toMap
    assert(m(2) > 0.99)
    assert(math.abs(m(1)) < 0.01 && math.abs(m(3)) < 0.01)
  }
}
