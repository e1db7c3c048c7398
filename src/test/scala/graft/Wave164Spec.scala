package graft

import graft.queries.Breadth155
import org.apache.spark.sql.functions._

/** Fixtures for the hundred-fifty-sixth wave (Breadth155 percolation
  * curve + degree hubs). */
class Wave164Spec extends SparkSpec {
  import spark.implicits._

  private def pad(v: Seq[Float]): Array[Float] =
    (v ++ Seq.fill(64 - v.length)(0.0f)).toArray

  test("hand graph: a tight pair and an isolated vector — curve " +
    "monotone in tau, hub table names the pair") {
    val emb = Seq(
      (1L, pad(Seq(1.0f, 0.0f)), 0),
      (2L, pad(Seq(0.9f, 0.1f)), 0), // cos(1,2) ~ 0.9939
      (3L, pad(Seq(0.0f, 0.0f, 1.0f)), 0)) // orthogonal
      .toDF("vec_id", "embedding", "label")
    val got = Breadth155.percolation(emb).collect()
      .map(r => r.getAs[Double]("threshold") ->
        (r.getAs[Long]("n_edges"), r.getAs[Long]("n_nodes"),
          r.getAs[Long]("max_degree"))).toMap
    Breadth155.Thresholds.foreach { t =>
      assert(got(t) == (1L, 2L, 1L), s"tau $t sees exactly the pair")
    }
    val hubs = Breadth155.degreeHubs(emb).collect()
    assert(hubs.map(_.getAs[Long]("node")).toSet == Set(1L, 2L))
  }

  test("curve is monotone: edges and max degree never grow with tau") {
    val got = Breadth155.percolation(Tables.embeddings(spark, sf0001))
      .collect().sortBy(_.getAs[Double]("threshold"))
    val edges = got.map(_.getAs[Long]("n_edges"))
    assert(edges.zip(edges.tail).forall { case (a, b) => a >= b })
    val md = got.map(_.getAs[Long]("max_degree"))
    assert(md.zip(md.tail).forall { case (a, b) => a >= b })
    assert(edges.head > 0L, "the 0.30 band is non-empty (not vacuous)")
    got.foreach { r =>
      assert(r.getAs[Double]("avg_degree") ==
        2.0 * r.getAs[Long]("n_edges") / 500.0)
    }
  }

  test("hub degrees are consistent with the 0.40 band edge count") {
    val emb = Tables.embeddings(spark, sf0001)
    val hubs = Breadth155.degreeHubs(emb).collect()
    assert(hubs.length == 10)
    assert(hubs.map(_.getAs[Long]("rank")).toSeq == (1L to 10L))
    val curve = Breadth155.percolation(emb).collect()
      .find(_.getAs[Double]("threshold") == 0.40).get
    assert(hubs.head.getAs[Long]("degree") ==
      curve.getAs[Long]("max_degree"))
  }
}
