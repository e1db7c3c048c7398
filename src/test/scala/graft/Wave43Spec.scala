package graft

import graft.queries.Breadth43
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the forty-fourth wave (Breadth43 kNN-graph
  * analytics). */
class Wave43Spec extends SparkSpec {
  import spark.implicits._

  private def edges(rows: (Long, Long)*) =
    rows.toDF("id_a", "id_b")

  test("triangleStats: one triangle plus a pendant — counts, degrees " +
    "and clustering coefficients are the hand values") {
    // 1-2, 1-3, 2-3 (triangle) and 3-4 (pendant edge)
    val got = Breadth43.triangleStats(edges((1L, 2L), (1L, 3L), (2L, 3L),
        (3L, 4L)))
      .orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSeq
    assert(got === Seq(
      (1L, 2L, 1L, Some(1.0)),
      (2L, 2L, 1L, Some(1.0)),
      (3L, 3L, 1L, Some(1.0 / 3.0)),
      (4L, 1L, 0L, None)))
  }

  test("triangleStats: K4 — every node closes three triangles with " +
    "clustering 1") {
    val k4 = edges((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L))
    val got = Breadth43.triangleStats(k4).orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq === Seq((1L, 3L, 1.0), (2L, 3L, 1.0), (3L, 3L, 1.0),
      (4L, 3L, 1.0)))
  }

  test("linkPredict: C4 — both diagonals score 2 shared neighbours, " +
    "Jaccard 1, Adamic-Adar 2/ln 2; adjacent pairs are excluded") {
    // cycle 1-3-2-4-1: the only non-edges are the diagonals (1,2), (3,4)
    val got = Breadth43.linkPredict(edges((1L, 3L), (2L, 3L), (1L, 4L),
        (2L, 4L)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    val aa = BigDecimal(2.0 / math.log(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got === Seq((1L, 2L, 2L, 1.0, aa), (3L, 4L, 2L, 1.0, aa)))
  }

  test("knnEdges: blocks smaller than k collapse to complete " +
    "within-label graphs, canonical and deduped") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f), 0), (1L, Array(0.9f, 0.1f), 0),
      (2L, Array(0.0f, 1.0f), 0),
      (10L, Array(1.0f, 1.0f), 1), (11L, Array(0.5f, 0.5f), 1))
      .toDF("vec_id", "embedding", "label")
    val got = Breadth43.knnEdges(emb).orderBy("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((0L, 1L), (0L, 2L), (1L, 2L), (10L, 11L)))
  }
}
