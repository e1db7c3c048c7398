package graft

import graft.queries.Breadth91

/** Closed-form fixtures for the ninety-second wave (Breadth91 label
  * centroids / centroid similarity / norm histogram). */
class Wave94Spec extends SparkSpec {
  import spark.implicits._

  private val emb = Seq(
    (0L, 1, Array(1.0f, 0.0f)),
    (1L, 1, Array(0.0f, 1.0f)),
    (2L, 2, Array(1.0f, 1.0f)),
    (3L, 3, Array(1.0f, -1.0f)))
    .toDF("vec_id", "label", "embedding")

  test("labelCentroids: exact quantized component sums and means") {
    val got = Breadth91.labelCentroids(emb)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSeq
    assert(got === Seq(
      (1, 0L, 2L, 1000000L, 0.5), (1, 1L, 2L, 1000000L, 0.5),
      (2, 0L, 1L, 1000000L, 1.0), (2, 1L, 1L, 1000000L, 1.0),
      (3, 0L, 1L, 1000000L, 1.0), (3, 1L, 1L, -1000000L, -1.0)))
  }

  test("centroidSim: parallel centroids score 1, orthogonal score 0") {
    val got = Breadth91.centroidSim(emb)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
      .toSeq
    assert(got === Seq((1, 2, 1.0), (1, 3, 0.0), (2, 3, 0.0)))
  }

  test("normHist: unit vectors bucket at 1.0, sqrt-2 vectors at 1.4") {
    val got = Breadth91.normHist(emb)
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getLong(2)))
      .toSeq
    assert(got === Seq((1, 1.0, 2L), (2, 1.4, 1L), (3, 1.4, 1L)))
  }
}
